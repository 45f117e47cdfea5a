"""Write a full-size random-init train-state checkpoint.

Serving/eval benches (export-model, serve, bench_eval_tail) need a
checkpoint_best.npz but not trained weights — descriptor math and
program shapes are init-independent. This builds one on the host in a
few seconds without touching a device.

usage:
  python tools/make_random_checkpoint.py -o /tmp/ls/checkpoint_best.npz \
      [--num-classes 625] [--tiny]
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--num-classes", type=int, default=625)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # init on host, not the tunnel

    from grl_tpu import models
    from grl_tpu.engine.optim import SGD
    from grl_tpu.engine.train_step import init_train_state
    from grl_tpu.utils.serialization import save_train_state

    if args.tiny:
        # mirror cli/train.py::build_models(tiny=True) exactly — the
        # checkpoint must load through export-model/evaluate --tiny
        trunk = models.ResNetTrunk(layers=(1, 1, 1, 1), width=4)
        cnn = models.GRLModel(trunk=trunk)
        sia = models.Siamese(input_num=cnn.num_feat, output_num=512)
        unc = models.SiameseVideo(input_num=cnn.num_feat)
    else:
        cnn = models.create("resnet50_grl")
        sia = models.Siamese(input_num=cnn.num_feat, output_num=512)
        unc = models.SiameseVideo(input_num=cnn.num_feat)
    state = init_train_state(
        jax.random.PRNGKey(args.seed), cnn, sia, unc, args.num_classes,
        num_feat=cnn.num_feat, optimizer=SGD(),
    )
    os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
    save_train_state(state, {"epoch": 0, "best_top1": 0.0}, args.out)
    print(f"wrote random-init train state ({args.num_classes} classes, "
          f"{'tiny' if args.tiny else 'full'}) to {args.out}")


if __name__ == "__main__":
    main()
