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
def load_reference_evaluator():
    """Returns (eva_functions, rerank) — both pure numpy/sklearn/torch-CPU."""
    # eva_functions.py does `from utils import to_torch, to_numpy` against
    # the reference's root-level utils package.
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        eva = _load("_refeval_eva_functions", f"{REF}/reid/evaluator/eva_functions.py")
        rerank = _load("_refeval_rerank", f"{REF}/reid/evaluator/rerank.py")
    finally:
        sys.path.remove(REF)
    return eva, rerank
