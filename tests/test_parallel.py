"""Multi-device sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4:
shard_map/pjit tests stand in for distributed tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ted_spad_tpu.parallel import data_parallel_mesh, replicate, shard_batch
from ted_spad_tpu.parallel.mesh import pad_to_multiple


class TestMeshHelpers:
    def test_mesh_has_all_devices(self):
        mesh = data_parallel_mesh()
        assert mesh.devices.size == len(jax.devices()) == 8

    def test_shard_and_replicate(self):
        mesh = data_parallel_mesh()
        batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
        sharded = shard_batch(mesh, batch)
        assert len(sharded["x"].sharding.device_set) == 8
        params = replicate(mesh, {"w": np.ones((3, 3), np.float32)})
        assert params["w"].sharding.is_fully_replicated

    def test_pad_to_multiple(self):
        batch = np.arange(10, dtype=np.float32).reshape(10, 1)
        padded, mask = pad_to_multiple(batch, 8)
        assert padded.shape == (16, 1)
        assert mask.sum() == 10 and not mask[10:].any()


def test_sharded_extraction_step_runs():
    """Extraction step with the batch sharded over all 8 devices: compiles + executes
    with psum-free data parallelism (inference has no cross-shard reduction)."""
    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.models import load_ft_model
    from ted_spad_tpu.parallel import data_parallel_mesh, replicate, shard_batch
    from ted_spad_tpu.stages.feature_extraction import make_extract_step

    mesh = data_parallel_mesh()
    p = FeatureExtractionParams(num_frames=8, reso_h=32, reso_w=32, compute_dtype="float32")
    ft_model, ft_vars = load_ft_model(
        "largei3d", num_classes=4, clip_shape=(8, 32, 32), dtype="float32"
    )
    ft_vars = replicate(mesh, ft_vars)
    extract = make_extract_step(ft_model, p, mesh=mesh)
    clips = np.random.default_rng(0).integers(0, 255, (8, 8, 48, 64, 3), dtype=np.uint8)
    clips_sharded = shard_batch(mesh, jnp.asarray(clips))
    feats = extract(ft_vars, clips_sharded)
    assert feats.shape == (8, 2048)
    assert len(feats.sharding.device_set) == 8  # output stays sharded
    # Correctness: matches single-device run.
    extract1 = make_extract_step(ft_model, p)
    ref = extract1(jax.device_put(ft_vars, jax.devices()[0]), jnp.asarray(clips))
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref), rtol=2e-4, atol=1e-4)


def test_sharded_action_train_step_matches_single_device():
    """Action TRAIN step with the batch sharded over 8 devices: GSPMD must turn the
    batch-axis reductions (BN batch stats, loss mean, grad mean) into collectives that
    reproduce the single-device numbers — the DataParallel replacement for the hot
    fine-tuning loop (train_action.py:237-240)."""
    from ted_spad_tpu.config.params import ActionParams
    from ted_spad_tpu.models import load_ft_model
    from ted_spad_tpu.ops.augment import sample_augment_params
    from ted_spad_tpu.parallel import data_parallel_mesh, replicate, shard_batch
    from ted_spad_tpu.stages.action_training import make_train_step
    from ted_spad_tpu.stages.common import make_optimizer

    p = ActionParams(arch="largei3d", num_frames=8, reso_h=32, reso_w=32,
                     batch_size=8, compute_dtype="float32")
    model, variables = load_ft_model("largei3d", num_classes=4, clip_shape=(8, 32, 32),
                                     dtype="float32")
    opt = make_optimizer(p.opt_type, p.learning_rate, p.weight_decay)
    st = opt.init(variables["params"])
    step = make_train_step(model, opt, p)
    r = np.random.default_rng(0)
    clips = jnp.asarray(r.integers(0, 255, (8, 1, 8, 48, 64, 3), dtype=np.uint8))
    labels = jnp.zeros((8,), jnp.int32)
    aug = sample_augment_params(np.random.default_rng(1), 8, 48, 64, 32, 32).to_device()
    key = jax.random.PRNGKey(0)

    # The train step donates (consumes) variables/opt_state — feed it copies so the
    # originals survive for the sharded run below.
    dup = lambda t: jax.tree.map(jnp.copy, t)
    nv1, _, loss1 = step(dup(variables), dup(st), key, clips, labels, aug)

    mesh = data_parallel_mesh()
    vr, sr = replicate(mesh, variables), replicate(mesh, st)
    sh = lambda x: shard_batch(mesh, x)
    nv8, _, loss8 = step(vr, sr, key, sh(clips), sh(labels), jax.tree.map(sh, aug))

    assert float(loss8) == pytest.approx(float(loss1), rel=1e-4)
    l1 = jax.tree_util.tree_leaves(nv1["params"])[0]
    l8 = jax.tree_util.tree_leaves(nv8["params"])[0]
    np.testing.assert_allclose(np.asarray(l8), np.asarray(l1), rtol=1e-4, atol=1e-6)
    bs1 = jax.tree_util.tree_leaves(nv1.get("batch_stats", {}))
    bs8 = jax.tree_util.tree_leaves(nv8.get("batch_stats", {}))
    for a, b in zip(bs1, bs8):
        # f32 batch-stat means/vars reduce in shard order under GSPMD — identical
        # math, different summation order; tolerance covers the reassociation noise.
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5)


def test_fa_step_gradient_accumulation_runs():
    """accum_steps microbatching (stages/anonymization_training.py) produces finite losses
    and updates params on the CPU mesh."""
    import jax
    import jax.numpy as jnp

    from ted_spad_tpu.config.params import AnonymizationParams
    from ted_spad_tpu.models import load_fa_model, load_fb_model, load_ft_model
    from ted_spad_tpu.stages.anonymization_training import make_fa_step
    from ted_spad_tpu.stages.common import make_optimizer

    p = AnonymizationParams(num_classes=4, num_frames=8, reso_h=32, reso_w=32, compute_dtype="float32")
    fa_model, fa_vars = load_fa_model(image_size=(32, 32), dtype="float32")
    ft_model, ft_vars = load_ft_model("largei3d", num_classes=4, clip_shape=(8, 32, 32), dtype="float32")
    fb_model, fb_vars = load_fb_model(ssl=True, image_size=(32, 32), dtype="float32")
    opt_fa = make_optimizer("adam", 1e-3)
    st = opt_fa.init(fa_vars["params"])
    r = np.random.default_rng(0)
    v1 = jnp.asarray(r.random((4, 32, 32, 3)).astype(np.float32))
    v2 = jnp.asarray(r.random((4, 32, 32, 3)).astype(np.float32))
    clips = jnp.asarray(r.random((4, 3, 8, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(r.integers(0, 4, 4))
    step = make_fa_step(fa_model, fb_model, ft_model, opt_fa, p, accum_steps=2)
    # Snapshot before the call: the step donates (consumes) fa_vars/opt_state.
    before = np.asarray(jax.tree_util.tree_leaves(fa_vars["params"])[0])
    new_fa, _, *losses = step(fa_vars, st, fb_vars, ft_vars, jax.random.PRNGKey(0), v1, v2, clips, labels)
    assert all(np.isfinite(float(x)) for x in losses)
    after = jax.tree_util.tree_leaves(new_fa["params"])[0]
    assert not np.allclose(before, np.asarray(after))  # params moved


class TestInitializeDistributed:
    """multihost.initialize_distributed must only swallow the known single-process
    case; cluster markers or explicit args escalate failures (VERDICT r1 weak #6)."""

    def _raiser(self, *a, **k):
        raise RuntimeError("coordinator unreachable")

    def test_single_process_failure_swallowed(self, monkeypatch):
        from ted_spad_tpu.parallel import multihost

        monkeypatch.setattr(jax.distributed, "initialize", self._raiser)
        for marker in multihost.CLUSTER_MARKERS:
            monkeypatch.delenv(marker, raising=False)
        multihost.initialize_distributed()  # no-op, no raise

    def test_cluster_marker_failure_raises(self, monkeypatch):
        from ted_spad_tpu.parallel import multihost

        monkeypatch.setattr(jax.distributed, "initialize", self._raiser)
        monkeypatch.setenv("SLURM_JOB_NUM_NODES", "4")
        with pytest.raises(RuntimeError, match="coordinator unreachable"):
            multihost.initialize_distributed()

    def test_explicit_args_failure_raises(self, monkeypatch):
        from ted_spad_tpu.parallel import multihost

        monkeypatch.setattr(jax.distributed, "initialize", self._raiser)
        with pytest.raises(RuntimeError, match="coordinator unreachable"):
            multihost.initialize_distributed(
                coordinator_address="10.0.0.1:1234", num_processes=2, process_id=0
            )
