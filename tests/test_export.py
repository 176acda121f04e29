"""AOT serving export (tools/export_model.py): serialize forward+decode via
jax.export and check the deserialized artifact reproduces the live jit.

Gated behind ISEG_RUN_SLOW (it compiles a B0 eval+decode program, several
minutes cold on this 1-core host). Verified in-session on CPU:
`python tools/export_model.py --out /tmp/b0.shlo --compound 0 --hw 128 256
--batch 1 --verify` -> exact match.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(not os.environ.get("ISEG_RUN_SLOW"),
                                reason="set ISEG_RUN_SLOW=1 to run")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_export_roundtrip(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from export_model import build_export
    from jax import export as jexport

    exp, fn, example = build_export(
        compound=0, hw=(128, 256), batch=1, num_classes=8)
    blob = exp.serialize()
    assert len(blob) > 1000
    rehydrated = jexport.deserialize(bytearray(blob))
    got = rehydrated.call(example)
    want = fn(example)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
