"""Standalone evaluation entry — the reference's ``test_all.py`` intent.

``python -m grl_tpu.cli.evaluate -d mars --data-dir ... --logs-dir ...``

The reference test_all.py is broken as shipped (defines ``--a1/--a2`` but
reads ``args.arch1/arch2``, references ``args.logs_dir1``/``args.visul``,
test_all.py:76-91,113-157); this exposes the intended behavior — load the
best checkpoint, dense-sample every tracklet, report CMC/mAP — with a
coherent flag set.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

import jax
import numpy as np

import jax.numpy as jnp

from ..data import get_data
from ..engine.evaluator import Evaluator
from ..engine.optim import SGD
from ..engine.train_step import init_train_state
from ..utils import Logger
from ..utils.serialization import load_train_state
from .train import build_models, state_to_device, validate_args


def main(args):
    from ..parallel import maybe_initialize_distributed
    from ..utils.profiling import enable_compilation_cache

    validate_args(args)
    maybe_initialize_distributed()  # must precede any backend init
    enable_compilation_cache()
    run = 0
    # per-process tee logs under multi-host (see cli/train.py)
    psuf = f".p{jax.process_index()}" if jax.process_index() else ""
    while osp.exists(osp.join(args.logs_dir, f"log_test{run}{psuf}.txt")):
        run += 1
    sys.stdout = Logger(osp.join(args.logs_dir, f"log_test{run}{psuf}.txt"))
    print(f"==========\nArgs:{args}\n==========")

    nproc = jax.process_count()
    dataset, num_classes, _train_loader, query_loader, gallery_loader = get_data(
        args.dataset,
        args.data_dir,
        args.batch_size,
        args.seq_len,
        args.seq_srd,
        args.workers,
        only_eval=True,
        split_id=args.split,
        dataset_kwargs=dict(seed=args.seed) if args.dataset == "synthetic" else None,
        use_flow=bool(getattr(args, "use_flow", False)),
        eval_stripe=nproc > 1,
    )
    multihost = None
    if nproc > 1:
        # each process extracted only its stripe; the evaluator assembles
        # globally-sharded features and runs the protocol SPMD over the pod
        from ..parallel import eval_catalog_meta

        multihost = {"query": eval_catalog_meta(dataset.query),
                     "gallery": eval_catalog_meta(dataset.gallery)}

    if args.visual_from:
        # round-trip of --save-distmat: re-render ranked strips and re-run
        # the protocol from a saved distance matrix WITHOUT re-extracting
        # features (the reference's --visual loads a dist.mat nothing in
        # its repo ever writes, attevaluator.py:130-135 — this pair
        # completes that intent). No model, checkpoint, or device work.
        if nproc > 1:
            raise SystemExit("--visual-from is single-host (it renders "
                             "from the full catalogs)")
        from ..engine import metrics
        from ..engine.evaluator import eval_items, print_protocol
        from ..engine.visualize import visualize_ranked_results

        blob = np.load(args.visual_from)
        distmat = blob["distmat"]
        q_items, g_items = eval_items(query_loader, gallery_loader)
        if distmat.shape != (len(q_items), len(g_items)):
            raise SystemExit(
                f"saved distmat is {distmat.shape} but the catalogs are "
                f"({len(q_items)}, {len(g_items)}) — was it saved from the "
                "same dataset/split?"
            )
        cmc_curve, mAP = metrics.evaluate(
            distmat, blob["q_pids"], blob["g_pids"],
            blob["q_camids"], blob["g_camids"],
        )
        print_protocol(cmc_curve, mAP)
        vis_dir = osp.join(args.logs_dir, "visual")
        visualize_ranked_results(distmat, q_items, g_items, vis_dir)
        print(f"saved ranked visualizations to {vis_dir}")
        print("rank-1 accuracy is", float(cmc_curve[0]))
        return float(cmc_curve[0])

    cnn, siamese, siamese_uncorr = build_models(args, tiny=args.tiny)
    template = init_train_state(
        jax.random.PRNGKey(args.seed), cnn, siamese, siamese_uncorr,
        num_classes, num_feat=cnn.num_feat, optimizer=SGD(),
    )
    state, _ = load_train_state(
        template, args.checkpoint or osp.join(args.logs_dir, "checkpoint_best.npz")
    )
    state = state_to_device(state)

    from ..config import ExperimentConfig
    from ..parallel import auto_mesh

    # all local devices share the dense-extraction load (the reference's
    # DataParallel eval default, test_all.py:81)
    mesh = auto_mesh(limit=args.devices or None)
    if mesh is not None:
        print(f"data-parallel mesh over {mesh.devices.size} devices")
    if nproc > 1 and (mesh is None or mesh.devices.size != len(jax.devices())):
        raise SystemExit(
            "multi-host evaluation: the mesh must span every device "
            f"({len(jax.devices())}); drop --devices"
        )

    cfg = ExperimentConfig.from_args(args)
    evaluator = Evaluator(cnn, siamese, only_eval=True, rerank=bool(args.rerank),
                          micro_batch=cfg.eval.micro_batch, rerank_k1=cfg.eval.rerank_k1,
                          rerank_k2=cfg.eval.rerank_k2, rerank_lambda=cfg.eval.rerank_lambda,
                          visual_dir=osp.join(args.logs_dir, "visual") if args.visual else None,
                          mesh=mesh, save_distmat=args.save_distmat or None)
    top1 = evaluator.evaluate(state["params"], state["model_state"], query_loader,
                              gallery_loader, multihost=multihost)
    print("rank-1 accuracy is", top1)
    return top1


def build_parser():
    # defaults from the typed test_all preset (config.py; reference
    # test_all.py's intended defaults with its argparse bugs fixed)
    from ..config import PRESETS

    cfg = PRESETS["test_all"]()
    parser = argparse.ArgumentParser(description="GRL-TPU evaluation")
    parser.add_argument("-d", "--dataset", type=str, default=cfg.data.dataset,
                        choices=["ilidsvidsequence", "prid2011sequence", "mars", "duke", "synthetic"])
    parser.add_argument("-b", "--batch-size", type=int, default=cfg.data.batch_size)
    parser.add_argument("-j", "--workers", type=int, default=cfg.data.workers)
    parser.add_argument("--seq_len", type=int, default=cfg.data.seq_len)
    parser.add_argument("--seq_srd", type=int, default=cfg.data.seq_srd)
    parser.add_argument("--split", type=int, default=cfg.data.split)
    parser.add_argument("--arch1", type=str, default=cfg.model.arch1)
    parser.add_argument("--arch2", type=str, default=cfg.model.arch2)
    parser.add_argument("--features", type=int, default=cfg.model.features)
    parser.add_argument("--dropout", type=float, default=cfg.model.dropout)
    parser.add_argument("--seed", type=int, default=cfg.seed)
    parser.add_argument("--rerank", type=int, default=0)
    parser.add_argument("--visual", type=int, default=0)
    parser.add_argument("--save-distmat", type=str, default="", dest="save_distmat",
                        metavar="NPZ",
                        help="persist the final (post-rerank) distance matrix "
                             "+ pids/camids for --visual-from round-trips")
    parser.add_argument("--visual-from", type=str, default="", dest="visual_from",
                        metavar="NPZ",
                        help="re-render ranked strips + re-run the protocol "
                             "from a --save-distmat npz without re-extracting "
                             "features (no checkpoint needed)")
    parser.add_argument("--data-dir", type=str, metavar="PATH", default="")
    parser.add_argument("--logs-dir", type=str, metavar="PATH", default="log/grl")
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--use-flow", action="store_true",
                        help="sequence datasets only: evaluate a flow-trained "
                             "checkpoint on 6-channel (RGB|flow) clips")
    parser.add_argument("--devices", type=int, default=0,
                        help="cap the data-parallel device count (0 = all local devices)")
    return parser


def cli():
    """Console-script entry point (pyproject [project.scripts]).

    Swallows main()'s python-API return value (the best/eval top1
    float): the pip wrapper runs ``sys.exit(cli())``, and sys.exit
    treats any non-None, non-int value as failure-with-message."""
    main(build_parser().parse_args())


if __name__ == "__main__":
    cli()
