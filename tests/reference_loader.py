"""Load the literal reference modules from /root/reference via importlib.

The reference package __init__ files import torchvision (absent here) and
its model constructors download ImageNet weights (no egress), so modules
are loaded file-by-file with a stub torchvision and the pretrained load
bypassed. Everything else is the reference's own code, byte-for-byte —
these loaders exist so parity tests pin against the reference itself
instead of a hand-written transcription of it.

Covered surfaces:
- models: reid/models/{resnets1,basebranch,grl_model,Siamese,Siamese_video}.py
- evaluator: reid/evaluator/{eva_functions,rerank}.py
"""

from __future__ import annotations

import functools
import importlib.util
import sys
import types

REF = "/root/reference"


def _load(name, path, package=None):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    if package:
        mod.__package__ = package
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@functools.lru_cache(maxsize=1)
def load_reference_models():
    """Returns a namespace with the reference model modules loaded.

    ``grl_model.ResNet50_GRL_Model(pretrained=False, ...)`` constructs
    without network access (basebranch.py:25 hardcodes
    resnet50_s1(pretrained=True); the module-global is rebound to a
    non-downloading constructor — weights are overwritten by the test's
    converted init anyway).
    """
    # grl_model.py imports torchvision at module scope but never uses it
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    pkg = types.ModuleType("_refmodels")
    pkg.__path__ = []
    sys.modules["_refmodels"] = pkg

    resnets1 = _load("_refmodels.resnets1", f"{REF}/reid/models/resnets1.py", "_refmodels")
    basebranch = _load("_refmodels.basebranch", f"{REF}/reid/models/basebranch.py", "_refmodels")
    basebranch.resnet50_s1 = lambda *a, **k: resnets1.resnet50_s1(pretrained=False)
    grl_model = _load("_refmodels.grl_model", f"{REF}/reid/models/grl_model.py", "_refmodels")
    siamese = _load("_refmodels.Siamese", f"{REF}/reid/models/Siamese.py", "_refmodels")
    siamese_video = _load(
        "_refmodels.Siamese_video", f"{REF}/reid/models/Siamese_video.py", "_refmodels"
    )
    return types.SimpleNamespace(
        resnets1=resnets1,
        basebranch=basebranch,
        grl_model=grl_model,
        Siamese=siamese,
        Siamese_video=siamese_video,
    )


@functools.lru_cache(maxsize=1)
def load_reference_training():
    """Load the reference's literal loss + trainer stack (reid.loss,
    reid.train.trainer) via the normal import machinery.

    One bit-rot adaptation: ``reid/loss/oim.py`` uses the pre-torch-1.3
    legacy ``autograd.Function`` protocol (instance ``__init__`` +
    non-static forward), which torch >= 1.3 refuses to CALL. The module's
    ``oim`` binding is re-pointed at a new-style Function whose
    forward/backward invoke the LITERAL ``OIM.forward`` / ``OIM.backward``
    method bodies through a duck-typed ctx shim — the math executed
    (including the sequential in-backward lut momentum+renorm side effect)
    is byte-for-byte the reference's; only the autograd plumbing is
    modernized. SEQTrainer and OIMLoss are untouched.
    """
    import torch

    tv = sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    if not hasattr(tv, "utils"):
        tv.utils = types.ModuleType("torchvision.utils")
        tv.utils.save_image = None  # cam_functions imports it; never called here
        sys.modules["torchvision.utils"] = tv.utils

    sys.path.insert(0, REF)
    try:
        import reid.loss  # noqa: F401
        import reid.train.trainer as trainer_mod
    finally:
        sys.path.remove(REF)
    # `from .oim import oim` shadows the submodule attribute on the
    # package, so reach the module itself through sys.modules
    oim_mod = sys.modules["reid.loss.oim"]

    legacy = oim_mod.OIM

    class _Shim:
        """Duck-typed ctx for the literal legacy-method bodies."""

        def __init__(self, lut, momentum):
            self.lut = lut
            self.momentum = momentum
            self.needs_input_grad = (True, False)

        def save_for_backward(self, *tensors):
            self._saved = tensors

        @property
        def saved_tensors(self):
            return self._saved

    class _ModernOIM(torch.autograd.Function):
        @staticmethod
        def forward(ctx, inputs, targets, shim):
            ctx.shim = shim
            return legacy.forward(shim, inputs, targets)

        @staticmethod
        def backward(ctx, grad_outputs):
            grad_inputs, grad_targets = legacy.backward(ctx.shim, grad_outputs)
            return grad_inputs, grad_targets, None

    def modern_oim(inputs, targets, lut, momentum=0.5):
        return _ModernOIM.apply(inputs, targets, _Shim(lut, momentum))

    oim_mod.oim = modern_oim  # OIMLoss.forward resolves `oim` through its module
    return types.SimpleNamespace(
        loss=sys.modules["reid.loss"],
        oim=oim_mod,
        trainer=trainer_mod,
    )


@functools.lru_cache(maxsize=1)
def load_reference_evaluator():
    """Returns (eva_functions, rerank) — both pure numpy/sklearn/torch-CPU."""
    # eva_functions.py does `from utils import to_torch, to_numpy` against
    # the reference's root-level utils package. Only remove the sys.path
    # entry if THIS call added it — a caller may legitimately have REF on
    # its own path.
    added = REF not in sys.path
    if added:
        sys.path.insert(0, REF)
    try:
        eva = _load("_refeval_eva_functions", f"{REF}/reid/evaluator/eva_functions.py")
        rerank = _load("_refeval_rerank", f"{REF}/reid/evaluator/rerank.py")
    finally:
        if added:
            sys.path.remove(REF)
    return eva, rerank


@functools.lru_cache(maxsize=1)
def load_reference_mars():
    """Returns the literal reid/dataset/mars.py module. The Mars class
    hardcodes its dataset root in CLASS attributes (mars.py:13-21 —
    ignoring --data-dir is a documented reference bug); callers must
    re-point root/\\*_path/\\*_json_path at their tree before
    instantiating. Needs the reference's root-level ``utils`` package
    (write_json/read_json) on sys.path, like the evaluator loader."""
    added = REF not in sys.path
    if added:
        sys.path.insert(0, REF)
    try:
        return _load("_refdataset_mars", f"{REF}/reid/dataset/mars.py")
    finally:
        if added:
            sys.path.remove(REF)


def point_reference_mars_at(mars_cls, root):
    """Re-derive the literal Mars class's hardcoded path attributes for a
    given tree (same joins as mars.py:13-21)."""
    import os.path as osp

    mars_cls.root = root
    mars_cls.train_name_path = osp.join(root, "info/train_name.txt")
    mars_cls.test_name_path = osp.join(root, "info/test_name.txt")
    mars_cls.track_train_info_path = osp.join(root, "info/tracks_train_info.mat")
    mars_cls.track_test_info_path = osp.join(root, "info/tracks_test_info.mat")
    mars_cls.query_IDX_path = osp.join(root, "info/query_IDX.mat")
    mars_cls.split_train_json_path = osp.join(root, "ref_split_train.json")
    mars_cls.split_query_json_path = osp.join(root, "ref_split_query.json")
    mars_cls.split_gallery_json_path = osp.join(root, "ref_split_gallery.json")


@functools.lru_cache(maxsize=1)
def load_reference_duke():
    """Returns the literal reid/dataset/duke.py module. Like Mars, the
    class hardcodes its root (duke.py:30) — set
    ``DukeMTMCVidReID.root = <tree>`` before instantiating (all other
    paths derive from it in __init__). NOTE: it writes split_*.json
    caches INTO the tree and reads them back on re-instantiation."""
    added = REF not in sys.path
    if added:
        sys.path.insert(0, REF)
    try:
        return _load("_refdataset_duke", f"{REF}/reid/dataset/duke.py")
    finally:
        if added:
            sys.path.remove(REF)


@functools.lru_cache(maxsize=1)
def load_reference_sequences():
    """Returns (ilids_mod, prid_mod) — the literal sequence-dataset
    classes (they take ``root`` as a constructor arg, no hardcoded path).
    Imported through the normal package machinery: ilidsvidsequence does
    ``from reid.data.datasequence import Datasequence``."""
    added = REF not in sys.path
    if added:
        sys.path.insert(0, REF)
    try:
        # reid.data and reid.dataset's __init__s import each other
        # (data/dataloader.py:4 <-> dataset/ilidsvidsequence.py:4); only
        # this direction resolves the cycle: reid.data's dataloader pulls
        # reid.dataset while reid.data.datasequence is ALREADY in
        # sys.modules, whereas starting from reid.dataset hits
        # a partially-initialized reid.dataset without get_sequence
        import reid.data  # noqa: F401
        import reid.dataset.ilidsvidsequence as ilids_mod
        import reid.dataset.prid2011sequence as prid_mod
    finally:
        if added:
            sys.path.remove(REF)
    return ilids_mod, prid_mod
