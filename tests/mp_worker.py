"""Worker for the true multi-process distributed test (test_multiprocess.py).

Runs as one rank of a 2-process CPU 'slice' (Gloo collectives over localhost):
initializes jax.distributed through parallel/multihost.initialize_distributed,
builds the GLOBAL 2-device mesh (1 local CPU device per process), host-shards
deterministic MGFN batches with local_batch_slice/process_shard, and runs

  (a) ONE sharded train step (cross-process psum gradient all-reduce) — loss +
      updated-params checksum printed for cross-rank agreement checks;
  (b) the mesh-aware eval scorer on a sharded test batch, compared IN-PROCESS
      against the single-device scorer on the full batch — per-rank max |diff|
      printed (eval has no batch coupling, so cross-process must match tightly).

This exercises the real multi-host code path (process-spanning mesh +
make_array_from_process_local_data + collectives over a transport), which the
single-process virtual 8-device mesh cannot.

NOTE on train-loss tolerances: train-mode BatchNorm batch statistics are global
reductions; the cross-process all-reduce (Gloo) sums in a different order than a
single device, and the resulting ~1e-6 stat noise is amplified by the stacked BN
renormalizations and can flip MSNSD's magnitude top-k selections — so the train
loss is only LOOSELY comparable to single-process, while both ranks must agree
exactly and eval must match tightly.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # before backend init (axon is pre-forced)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "train"

    from ted_spad_tpu.parallel.multihost import (
        initialize_distributed,
        local_batch_slice,
        process_shard,
    )

    initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc

    if mode == "extract":
        # Per-host extraction recipe: each process extracts ITS file shard
        # (process_shard == DALI shard_id/num_shards) on its local device — no
        # global mesh needed; hosts are independent (dali_extraction.py:63-64).
        out_dir = sys.argv[5]
        from ted_spad_tpu.config.params import FeatureExtractionParams
        from ted_spad_tpu.stages.feature_extraction import extract_features

        sid, nsh = process_shard()
        p = FeatureExtractionParams(
            num_frames=8, reso_h=48, reso_w=64, compute_dtype="float32", anonymized=False
        )
        uris = [f"synthetic://n=48,h=40,w=80,seed={1000 * i}" for i in range(4)]
        res = extract_features(
            p, uris, out_dir, decode_hw=(40, 80), batch_size=4,
            shard_id=sid, num_shards=nsh, log_fn=lambda s: None,
        )
        print(json.dumps({"pid": pid, "saved": sorted(res["saved"]),
                          "clips": res["clips"]}), flush=True)
        return

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ted_spad_tpu.config.params import MGFNParams
    from ted_spad_tpu.models import load_mgfn_model
    from ted_spad_tpu.stages.anomaly_detection import (
        make_optimizer,
        make_score_fn,
        make_train_step,
    )

    devices = jax.devices()  # global: nproc x 1 CPU device
    mesh = Mesh(np.asarray(devices), ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    rep_sh = NamedSharding(mesh, P())

    p = MGFNParams(feature_size=32, dims=(8, 16, 32), depths=(1, 1, 1), dim_head=8)
    model, variables = load_mgfn_model(p, ncrops=1)  # same seed everywhere -> identical
    opt = make_optimizer(p)
    opt_state = opt.init(variables["params"])

    def replicate(tree):
        # device_put to non-addressable devices is disallowed cross-process; the
        # callback form materializes only the locally addressable shard (every
        # process holds the same host value, so replicas agree).
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_callback(
                np.shape(x), rep_sh, lambda idx, x=x: np.asarray(x)[idx]
            )
            if hasattr(x, "shape") and np.ndim(x) > 0
            else x,
            tree,
        )

    sid, nsh = process_shard()

    def shard(host):
        lb = local_batch_slice(host.shape[0])
        local = host[sid * lb : (sid + 1) * lb]
        return jax.make_array_from_process_local_data(batch_sh, local, host.shape)

    # (a) sharded train step --------------------------------------------------
    gb = 4  # global paired batch (per side)
    r = np.random.default_rng(0)
    nfeat_g = r.random((gb, 1, 32, 33), np.float32)  # feature_size+1 magnitude column
    afeat_g = r.random((gb, 1, 32, 33), np.float32)

    step = make_train_step(model, opt, p, mesh=mesh)
    new_vars, _, loss = step(
        replicate(variables), replicate(opt_state), jax.random.PRNGKey(0),
        shard(nfeat_g), shard(np.zeros((gb,), np.float32)),
        shard(afeat_g), shard(np.ones((gb,), np.float32)),
    )
    # Replicated outputs are not fully addressable from one process: read the
    # local shard. A second jitted reduction gives a params checksum the same way.
    loss_val = float(np.asarray(loss.addressable_shards[0].data))

    @jax.jit
    def checksum(tree):
        return sum(x.astype(jnp.float32).sum() for x in jax.tree_util.tree_leaves(tree))

    ck = float(np.asarray(checksum(new_vars["params"]).addressable_shards[0].data))

    # (b) mesh-aware eval scorer vs in-process single-device oracle -----------
    r2 = np.random.default_rng(1)
    tfeat = r2.random((gb, 1, 16, 33), np.float32)
    tmask = np.ones((gb, 16), bool)
    s_local = np.asarray(make_score_fn(model)(variables, jnp.asarray(tfeat), jnp.asarray(tmask)))
    sd = make_score_fn(model, mesh=mesh)(replicate(variables), shard(tfeat), shard(tmask))
    lb = local_batch_slice(gb)
    eval_diff = float(
        np.abs(np.asarray(sd.addressable_shards[0].data) - s_local[sid * lb : (sid + 1) * lb]).max()
    )

    print(json.dumps({"pid": pid, "loss": loss_val, "checksum": ck,
                      "eval_max_diff": eval_diff}), flush=True)


if __name__ == "__main__":
    main()
