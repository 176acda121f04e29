"""Unit tests for parallel/multihost.py (mocked distributed init)."""

import os
from unittest import mock


def test_maybe_initialize_noop_without_env(monkeypatch):
    from instance_segmentation_tpu.parallel.multihost import (
        maybe_initialize_multihost,
    )
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert maybe_initialize_multihost() is False


def test_maybe_initialize_calls_jax_distributed(monkeypatch):
    import jax
    from instance_segmentation_tpu.parallel.multihost import (
        maybe_initialize_multihost,
    )
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    with mock.patch.object(jax.distributed, "initialize") as init:
        assert maybe_initialize_multihost() is True
    init.assert_called_once_with(coordinator_address="10.0.0.1:1234",
                                 num_processes=4, process_id=2)


def test_process_batch_slice_arithmetic():
    import jax
    from instance_segmentation_tpu.parallel.multihost import process_batch_slice
    with mock.patch.object(jax, "process_count", return_value=4), \
         mock.patch.object(jax, "process_index", return_value=3):
        start, size = process_batch_slice(32)
        assert (start, size) == (24, 8)
    with mock.patch.object(jax, "process_count", return_value=1), \
         mock.patch.object(jax, "process_index", return_value=0):
        assert process_batch_slice(8) == (0, 8)
