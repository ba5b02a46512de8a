"""Loader for the LIVE torch reference at /root/reference (golden parity).

The reference fairseq fork targets torch 1.x / python 3.8 with omegaconf +
hydra installed; this environment has torch-cpu 2.x / python 3.12 and
neither config library.  This module makes the reference importable by

- stubbing the tiny omegaconf/hydra surface fairseq touches at import time
  (II/MISSING markers, ConfigStore.store no-op, GlobalHydra),
- patching ``dataclasses._get_field`` so python 3.12 accepts fairseq's
  nested-dataclass defaults (rewritten to default factories).

Nothing here alters reference *math* — only import plumbing.  Tests that
use this module compare our flax forward against the real reference
modules run on CPU (the golden-parity strategy SURVEY.md §4 calls for).

Everything is idempotent and scoped: stubs register only missing modules.
"""

from __future__ import annotations

import copy
import dataclasses as _dc
import importlib
import sys
import types

FAIRSEQ_ROOT = "/root/reference/fairseq"
REFERENCE_ROOT = "/root/reference"

_installed = False


def _stub_module(name: str, is_pkg: bool = False) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    if is_pkg:
        mod.__path__ = []  # mark as package so submodule imports resolve
    # a real ModuleSpec so importlib.util.find_spec probes don't choke
    import importlib.machinery
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    global _installed
    if _installed:
        return
    _installed = True

    # numpy>=1.24 removed the builtin aliases the old fairseq uses at
    # import time (indexed_dataset.py:112)
    import numpy as np
    for _name, _val in (("float", float), ("int", int), ("bool", bool),
                        ("object", object), ("complex", complex)):
        if not hasattr(np, _name):
            setattr(np, _name, _val)

    if "omegaconf" not in sys.modules:
        om = _stub_module("omegaconf", is_pkg=True)
        om.II = lambda s: "${" + s + "}"
        om.MISSING = "???"

        class DictConfig(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

        class ListConfig(list):
            pass

        class _OmegaConf:
            @staticmethod
            def create(obj=None, **kw):
                return DictConfig(obj or {})

            @staticmethod
            def set_struct(cfg, flag):
                pass

            @staticmethod
            def to_container(cfg, **kw):
                return dict(cfg)

        om.DictConfig = DictConfig
        om.ListConfig = ListConfig
        om.Container = dict
        om.OmegaConf = _OmegaConf
        om._utils = _stub_module("omegaconf._utils")
        om._utils.is_primitive_type = lambda t: True
        om.open_dict = lambda cfg: _NullCtx(cfg)
        om.read_write = lambda cfg: _NullCtx(cfg)
        _stub_module("omegaconf.errors").ConfigKeyError = KeyError

    if "hydra" not in sys.modules:
        _stub_module("hydra", is_pkg=True)
        _stub_module("hydra.core", is_pkg=True)
        cs_mod = _stub_module("hydra.core.config_store")

        class _Store:
            def store(self, *a, **k):
                pass

        class ConfigStore:
            @staticmethod
            def instance():
                return _Store()

        cs_mod.ConfigStore = ConfigStore

        gh_mod = _stub_module("hydra.core.global_hydra")

        class GlobalHydra:
            @staticmethod
            def instance():
                class _GH:
                    def is_initialized(self):
                        return False

                    def clear(self):
                        pass

                return _GH()

        gh_mod.GlobalHydra = GlobalHydra

        exp = _stub_module("hydra.experimental", is_pkg=True)
        exp.compose = lambda *a, **k: None
        exp.initialize = lambda *a, **k: _NullCtx(None)

    # light stubs for data/eval libs the reference imports at module scope
    # but the golden tests never exercise (we feed tensors directly)
    if "soundfile" not in sys.modules:
        sf = _stub_module("soundfile")

        def _unavailable(*a, **k):
            raise RuntimeError("soundfile stub: not available in tests")

        sf.read = _unavailable
        sf.write = _unavailable
        sf.info = _unavailable
        sf.SoundFile = _unavailable
        sf.available_formats = lambda: {}
    for _m in ("editdistance", "bitarray", "sentencepiece", "torchaudio",
               "torchvision"):
        _stub_module(_m)

    # torch>=2.6 defaults torch.load(weights_only=True), which rejects the
    # argparse.Namespace objects inside fairseq checkpoints; the reference
    # targets torch 1.x semantics.  Restore them for unqualified calls.
    import torch as _torch
    if not getattr(_torch, "_wav2vec_s_tpu_load_patched", False):
        _orig_load = _torch.load

        def _compat_load(*a, **k):
            k.setdefault("weights_only", False)
            return _orig_load(*a, **k)

        _torch.load = _compat_load
        _torch._wav2vec_s_tpu_load_patched = True

    # rain imports the compiled warp loss at module scope
    # (rain/layers/attention_transducer.py:42); the golden tests compare the
    # joint lattice, not the CUDA loss, so a constructible stub suffices.
    if "warprnnt_pytorch" not in sys.modules:
        wr = _stub_module("warprnnt_pytorch")

        class _StubLoss:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                raise RuntimeError("warprnnt stub: loss not available")

        wr.DelayTLoss = _StubLoss
        wr.RNNTLoss = _StubLoss

    # python>=3.11 rejects mutable dataclass defaults; fairseq's config
    # dataclasses nest instances as defaults.  Rewrite them to factories.
    if not getattr(_dc, "_wav2vec_s_tpu_patched", False):
        orig = _dc._get_field

        def _patched(cls, a_name, a_type, default_kw_only):
            try:
                return orig(cls, a_name, a_type, default_kw_only)
            except ValueError:
                default = getattr(cls, a_name)
                setattr(
                    cls, a_name,
                    _dc.field(
                        default_factory=lambda d=default: copy.deepcopy(d)))
                return orig(cls, a_name, a_type, default_kw_only)

        _dc._get_field = _patched
        _dc._wav2vec_s_tpu_patched = True


class _NullCtx:
    def __init__(self, obj):
        self.obj = obj

    def __enter__(self):
        return self.obj

    def __exit__(self, *a):
        return False


def load_fairseq():
    """Import and return the reference fairseq package (CPU torch)."""
    _install_stubs()
    if FAIRSEQ_ROOT not in sys.path:
        sys.path.insert(0, sys.path.pop(sys.path.index(FAIRSEQ_ROOT))
                        if FAIRSEQ_ROOT in sys.path else FAIRSEQ_ROOT)
    return importlib.import_module("fairseq")


def load_rain():
    """Import and return the reference rain package (needs fairseq)."""
    load_fairseq()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # rain.simul imports the vendored simuleval (agents base classes)
    simuleval_root = REFERENCE_ROOT + "/simuleval"
    if simuleval_root not in sys.path:
        sys.path.insert(0, simuleval_root)
    return importlib.import_module("rain")


def reference_available() -> bool:
    try:
        load_fairseq()
        return True
    except Exception:
        return False
