"""Async checkpoint writer tests (utils/checkpoint.AsyncCheckpointWriter): the
serialize+write runs off the train loop, but the payload snapshot is taken at
save() time — donation/mutation of the source tree after save must not leak
into the artifact."""

import os

import numpy as np
import pytest

from ted_spad_tpu.utils.checkpoint import (
    AsyncCheckpointWriter,
    BestCheckpointer,
    flush_checkpoints,
    load_checkpoint,
    save_temp,
)


def test_roundtrip_and_snapshot_isolation(tmp_path):
    w = AsyncCheckpointWriter()
    tree = {"params": {"w": np.arange(8, dtype=np.float32)}}
    path = str(tmp_path / "a.ckpt")
    w.save(path, {"model": tree, "epoch": 3})
    tree["params"]["w"] *= 0.0  # post-save mutation (donation analogue)
    w.flush()
    state = load_checkpoint(path)
    np.testing.assert_array_equal(state["model"]["params"]["w"], np.arange(8, dtype=np.float32))
    assert state["epoch"] == 3


def test_same_path_supersede_keeps_last(tmp_path):
    w = AsyncCheckpointWriter()
    path = str(tmp_path / "temp.ckpt")
    for epoch in range(30):
        w.save(path, {"epoch": epoch})
    w.flush()
    assert load_checkpoint(path)["epoch"] == 29


def test_flush_raises_worker_error(tmp_path):
    w = AsyncCheckpointWriter()
    bad_dir = tmp_path / "ro"
    bad_dir.mkdir()
    os.chmod(bad_dir, 0o500)  # read+exec only: the atomic tmp write fails
    try:
        w.save(str(bad_dir / "x.ckpt"), {"epoch": 1})
        if os.geteuid() == 0:
            pytest.skip("running as root: read-only dir does not fail writes")
        with pytest.raises(OSError):
            w.flush()
        w.flush()  # error cleared; subsequent flush is clean
    finally:
        os.chmod(bad_dir, 0o700)


def test_save_temp_and_load_are_read_after_write_consistent(tmp_path):
    # save_temp goes through the process-wide async writer; load_checkpoint drains
    # pending saves first, so an immediate read sees the newest payload.
    save_temp(str(tmp_path), "model", {"epoch": 7})
    state = load_checkpoint(str(tmp_path / "model_temp.ckpt"))
    assert state["epoch"] == 7
    flush_checkpoints()  # idempotent


def test_atexit_drains_unflushed_saves(tmp_path):
    """An exception escaping a train loop (no flush call) must not drop queued
    writes: the writer's atexit hook drains on process exit."""
    import subprocess
    import sys

    path = str(tmp_path / "orphan.ckpt")
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from ted_spad_tpu.utils.checkpoint import async_writer\n"
        "async_writer().save(%r, {'epoch': 11})\n"
        "raise SystemExit(3)  # exit WITHOUT flushing\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), path)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, timeout=120,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 3, r.stderr.decode()
    state = load_checkpoint(path)
    assert state["epoch"] == 11


def test_distinct_path_backpressure_all_durable(tmp_path):
    # More distinct paths than max_pending: save() applies backpressure instead of
    # accumulating snapshots; every artifact lands.
    w = AsyncCheckpointWriter(max_pending=2)
    for i in range(7):
        w.save(str(tmp_path / f"ck_{i}.ckpt"), {"epoch": i})
    w.flush()
    for i in range(7):
        assert load_checkpoint(str(tmp_path / f"ck_{i}.ckpt"))["epoch"] == i


def test_best_checkpointer_async_artifacts_durable_after_flush(tmp_path):
    best = BestCheckpointer(str(tmp_path), "model", mode="max")
    assert best.maybe_save(0.5, 1, {"x": np.ones(3, np.float32)}) is not None
    assert best.maybe_save(0.4, 2, {"x": np.zeros(3, np.float32)}) is None  # not better
    p2 = best.maybe_save(0.9, 3, {"x": np.full(3, 2.0, np.float32)})
    flush_checkpoints()
    assert best.best_path == p2 and os.path.exists(p2)
    state = load_checkpoint(p2)
    assert state["metric"] == pytest.approx(0.9)
    np.testing.assert_array_equal(state["x"], np.full(3, 2.0, np.float32))
