"""Multi-device sharding dry run on the 8-device virtual CPU mesh."""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    import importlib
    ge = importlib.import_module("__graft_entry__")
    ge.dryrun_multichip(8)
