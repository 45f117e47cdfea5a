"""Data-parallel scaling bench: sharded train step over 1..N devices.

On a real multi-chip host this measures actual scaling efficiency (global
batch grows with the mesh; perfect scaling = flat ms/step). On the
single-core CPU virtual mesh it only validates that the sharded programs
compile and run at every width — the printed times all share one core.

usage:
  python tools/bench_scaling.py                    # full model, real devices
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_scaling.py --tiny         # virtual mesh
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny trunk + tiny frames")
    ap.add_argument("--pairs-per-device", type=int, default=4)
    ap.add_argument("--seq_len", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from grl_tpu import models
    from grl_tpu.engine.optim import SGD
    from grl_tpu.engine.train_step import init_train_state, make_train_step
    from grl_tpu.parallel import data_mesh, replicate, shard_batch
    from grl_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cd = None if args.tiny else jnp.bfloat16
    if args.tiny:
        trunk = models.ResNetTrunk(layers=(1, 1, 1, 1), width=4)
        h, w = 32, 16
    else:
        trunk = models.resnet50_trunk(last_stride=1, compute_dtype=cd)
        h, w = 256, 128
    cnn = models.GRLModel(trunk=trunk, compute_dtype=cd)
    sia = models.Siamese(input_num=cnn.num_feat, output_num=16 if args.tiny else 512,
                         compute_dtype=cd)
    unc = models.SiameseVideo(input_num=cnn.num_feat, compute_dtype=cd)
    opt = SGD()
    ts0 = init_train_state(jax.random.PRNGKey(0), cnn, sia, unc, 625, cnn.num_feat, opt)
    step = make_train_step(cnn, sia, unc, opt, donate=False)

    total = len(jax.devices())
    widths = [d for d in (1, 2, 4, 8, 16, 32) if d <= total]
    rng = np.random.RandomState(0)
    base = None
    for ndev in widths:
        batch = 2 * args.pairs_per_device * ndev
        clips = rng.rand(batch, args.seq_len, h, w, 3).astype(np.float32)
        pids = np.repeat(np.arange(batch // 2) % 625, 2).astype(np.int32)
        mesh = data_mesh(ndev)
        ts = replicate(ts0, mesh)
        c = shard_batch(jnp.asarray(clips), mesh)
        p = shard_batch(jnp.asarray(pids), mesh)
        ts, m = step(ts, c, p, 1e-3)  # compile
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            ts, m = step(ts, c, p, 1e-3)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        if base is None:
            base = dt
        eff = base / dt
        print(
            f"devices={ndev:3d}  global_batch={batch:4d}  {dt * 1e3:8.1f} ms/step  "
            f"{batch / dt:8.0f} clips/s  weak-scaling eff {eff:.2f}"
        )


if __name__ == "__main__":
    main()
