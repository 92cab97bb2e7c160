"""torch state_dict <-> flax params converter.

Lets released reference checkpoints (`weights/*.pth`,
`build_model.py:96-110,345-349`) and ImageNet backbones load into the TPU
models.  Layout rules:
  - Conv2d weight (O, I, kh, kw)        -> flax kernel (kh, kw, I, O)
  - ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose
    (transpose_kernel=True) kernel (kh, kw, O, I)
  - Linear weight (O, I)                -> flax Dense kernel (I, O)
  - BatchNorm weight/bias               -> scale/bias;
    running_mean/var                    -> batch_stats mean/var
  - PReLU weight (1,)                   -> alpha scalar

Name translation is per-model (reference module names cited inline).  The
reference's own loader strips 'module.'/'sr_model.' prefixes
(`misc.py:35-44`); we accept both.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
from flax import traverse_util


def _conv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _deconv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # (I,O,kh,kw)->(kh,kw,O,I)


def strip_prefixes(state_dict: Dict[str, np.ndarray], words=("module.", "sr_model.")) -> Dict:
    out = {}
    for k, v in state_dict.items():
        for w in words:
            if k.startswith(w):
                k = k[len(w):]
        out[k] = v
    return out


class ConversionError(KeyError):
    pass


def convert_tree(params, batch_stats, torch_sd: Dict[str, np.ndarray], translate,
                 partial: bool = False):
    """Fill a flax (params, batch_stats) pair from a torch state_dict.

    `translate(flat_path: tuple, kind: str) -> torch key` maps each flax leaf
    to its torch tensor name; kind in {kernel, bias, scale, mean, var, alpha}.
    Raises ConversionError listing unmatched leaves, unless `partial`, in
    which case unmatched leaves keep their current values (backbone
    injection: only the backbone subtree exists in an ImageNet checkpoint).
    Returns (params, batch_stats[, n_filled when partial]).
    """
    missing = []
    filled = [0]

    def fill(tree, stats: bool):
        flat = traverse_util.flatten_dict(tree)
        out = {}
        for path, leaf in flat.items():
            name = path[-1]
            if stats:
                kind = {"mean": "mean", "var": "var"}[name]
            else:
                kind = {"kernel": "kernel", "bias": "bias", "scale": "scale",
                        "alpha": "alpha", "embedding": "kernel"}.get(name, name)
            tkey = translate(path, kind)
            if tkey is None or tkey not in torch_sd:
                missing.append(("/".join(map(str, path)), tkey))
                out[path] = leaf
                continue
            w = np.asarray(torch_sd[tkey])
            if kind == "kernel" and w.ndim == 4:
                # conv (O,I,kh,kw)->(kh,kw,I,O) and deconv (I,O,kh,kw)->
                # (kh,kw,O,I) are the same permutation
                w = _conv_w(w)
            elif kind == "kernel" and w.ndim == 5:
                # CrackFormer LocalSABlock positional embedding
                # (kk, u=1, 1, m, m) -> flax HWIO (m, m, 1, kk)
                w = np.transpose(w[:, 0], (2, 3, 1, 0))
            elif kind == "kernel" and w.ndim == 2:
                w = np.transpose(w, (1, 0))
            elif kind == "alpha":
                w = np.asarray(w).reshape(())
            if w.shape != np.shape(leaf):
                raise ConversionError(
                    f"shape mismatch at {path}: torch {w.shape} vs flax {np.shape(leaf)}"
                )
            out[path] = w.astype(np.asarray(leaf).dtype)
            filled[0] += 1
        return traverse_util.unflatten_dict(out)

    new_params = fill(params, stats=False)
    new_stats = fill(batch_stats, stats=True) if batch_stats else batch_stats
    if partial:
        return new_params, new_stats, filled[0]
    if missing:
        raise ConversionError(f"{len(missing)} unmatched leaves, e.g. {missing[:5]}")
    return new_params, new_stats


def _looks_deconv(path) -> bool:
    joined = "/".join(map(str, path)).lower()
    return "deconv" in joined or "convtranspose" in joined


# --------------------------------------------------------------------------
# Per-model name translators (flax path -> torch key). These encode the
# reference's module names; they are exercised structurally by synthetic
# round-trip tests (tests/test_torch_convert.py) - byte-exact validation
# needs the released .pth files, which are not shipped in this image.
# --------------------------------------------------------------------------


def translate_vgg_feat(path: Tuple, kind: str):
    """KBPN 'feat' head: torch Sequential indices 0,2,4,6 (kbpn.py:42-44)."""
    m = re.match(r"conv(\d)", str(path[-2]))
    if not m:
        return None
    idx = int(m.group(1)) * 2
    suffix = {"kernel": "weight", "bias": "bias"}[kind]
    return f"feat.{idx}.{suffix}"


def export_params_to_torch_names(params, translate) -> Dict[str, np.ndarray]:
    """Inverse direction (for tests and for exporting to the reference)."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        name = path[-1]
        kind = {"kernel": "kernel", "bias": "bias", "scale": "scale",
                "alpha": "alpha", "embedding": "kernel"}.get(name, name)
        tkey = translate(path, kind)
        if tkey is None:
            continue
        w = np.asarray(leaf)
        if name == "embedding" and w.ndim == 4:
            # CrackFormer LocalSABlock positional embedding: flax HWIO
            # (m, m, 1, kk) -> torch conv3d weight (kk, u=1, 1, m, m)
            w = np.transpose(w, (3, 2, 0, 1))[:, :, None]
        elif kind == "kernel" and w.ndim == 4:
            # (kh,kw,I,O)->(O,I,kh,kw) and (kh,kw,O,I)->(I,O,kh,kw) are the
            # same permutation - no deconv special case
            w = np.transpose(w, (3, 2, 0, 1))
        elif kind == "kernel" and w.ndim == 2:
            w = np.transpose(w, (1, 0))
        elif kind == "alpha":
            # torch PReLU stores weight as shape (1,), not a scalar
            w = w.reshape(1)
        out[tkey] = w
    return out
