"""Import shims that let the REAL reference modules under /root/reference run
on this box (CPU, no torchvision/timm/skimage/yacs installed).

The point of this package (VERDICT r3 "Next round" #1) is to break the
translator circularity: every conversion test so far synthesized reference
.pth files from our own params via our own name translators.  Here we import
the reference's actual torch modules, load a state dict exported by
`export_params_to_torch_names` into them with the reference's own
strictness contract (`build_model.py:345-349`: unexpected_keys == 0), and
compare forward outputs numerically.  A wrong name, transposed layout, or
architectural divergence in `utils/translators.py` now fails a test instead
of round-tripping silently.

What is faked, and how faithful each fake is:

- ``yacs``          -> our `csbsr_tpu.config.node.CfgNode` (already a
                       behaviour-compatible reimplementation; the reference
                       only needs CN() + attribute assignment,
                       `model/config/defaults.py:11-121`).
- ``torchvision``   -> `models.vgg16(...).features` with the canonical cfg-D
                       Sequential layout (indices 0..30) that the reference
                       slices by position (`kbpn.py:42-43`, `unet.py:143`);
                       `transforms.Resize` as tensor-mode
                       `F.interpolate(..., antialias=False)` (the era-correct
                       torchvision<=0.12 tensor backend the reference was
                       written against -- requirement.txt pins no version);
                       densenet/squeezenet entry points raise if called (the
                       shipped configs never call them).
- ``timm``          -> `DropPath`/`to_2tuple`/`trunc_normal_` +
                       `register_model`/`_cfg` no-ops (`crackformer.py:12-14`
                       uses exactly these).
- ``skimage``       -> `segmentation.find_boundaries(mask, mode='inner')` ==
                       mask & ~binary_erosion(mask, cross, border_value=1)
                       (scikit-image's documented inner-boundary semantics:
                       grey erosion pads with the max, so objects touching
                       the image border have no boundary there).
- cuda -> cpu       :: `Tensor.to/cuda` and `Module.to/cuda` redirect any
                       cuda device to cpu (the reference hard-codes
                       `.to('cuda')` in `build_model.py:118-123` and the
                       losses; the math is device-independent).

Call `install()` before importing anything from the reference tree.  It is
idempotent and safe for the rest of the suite: the fakes occupy module names
that are otherwise ImportError on this image, and the cuda->cpu patch is a
no-op on a CPU-only box.
"""
from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"

_installed = False


def _fake_yacs():
    from csbsr_tpu.config.node import CfgNode

    yacs = types.ModuleType("yacs")
    config = types.ModuleType("yacs.config")
    config.CfgNode = CfgNode
    yacs.config = config
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", config)


def _fake_torchvision():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from enum import Enum

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")

    # canonical VGG16 'D' features layout — torchvision indices 0..30.
    # KBPN slices [:4]+[5:9] (`kbpn.py:42-43`), UNet16 indexes 0..28
    # (`unet.py:143-176`); both rely on these exact positions.
    def _vgg16_features():
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
            else:
                layers.append(nn.Conv2d(in_ch, v, kernel_size=3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                in_ch = v
        return nn.Sequential(*layers)

    class _VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = _vgg16_features()

    def vgg16(pretrained=False, **kw):
        # pretrained weights are irrelevant: every oracle test overwrites
        # the whole net from an exported state dict before comparing.
        return _VGG()

    models.vgg16 = vgg16

    def _unavailable(name):
        def f(*a, **k):
            raise RuntimeError(f"shim torchvision.{name} is construct-only")
        return f

    densenet = types.ModuleType("torchvision.models.densenet")
    densenet.densenet121 = _unavailable("densenet121")
    densenet.densenet161 = _unavailable("densenet161")
    squeezenet = types.ModuleType("torchvision.models.squeezenet")
    squeezenet.squeezenet1_1 = _unavailable("squeezenet1_1")
    models.densenet = densenet
    models.squeezenet = squeezenet

    class InterpolationMode(Enum):
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"
        AREA = "area"

    class Resize:
        """Tensor-mode torchvision Resize, antialias=False era semantics."""

        def __init__(self, size, interpolation=InterpolationMode.BILINEAR, **kw):
            self.size = tuple(size) if not isinstance(size, int) else (size, size)
            self.interpolation = interpolation

        def __call__(self, img):
            mode = self.interpolation.value
            x = img.unsqueeze(0) if img.dim() == 3 else img
            out = F.interpolate(x, size=self.size, mode=mode,
                                align_corners=False)
            return out.squeeze(0) if img.dim() == 3 else out

    transforms = types.ModuleType("torchvision.transforms")
    transforms.InterpolationMode = InterpolationMode
    transforms.Resize = Resize
    transforms.__all__ = ["InterpolationMode", "Resize"]
    functional = types.ModuleType("torchvision.transforms.functional")
    functional.InterpolationMode = InterpolationMode
    transforms.functional = functional

    tv.models = models
    tv.transforms = transforms
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", models)
    sys.modules.setdefault("torchvision.models.densenet", densenet)
    sys.modules.setdefault("torchvision.models.squeezenet", squeezenet)
    sys.modules.setdefault("torchvision.transforms", transforms)
    sys.modules.setdefault("torchvision.transforms.functional", functional)


def _fake_timm():
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    tmodels = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        """Stochastic depth; identity in eval mode (timm semantics)."""

        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rand = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * rand.floor_()

    def to_2tuple(x):
        if isinstance(x, (tuple, list)):
            return tuple(x)
        return (x, x)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_

    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn
    vit = types.ModuleType("timm.models.vision_transformer")
    vit._cfg = lambda url="", **kw: dict(url=url, **kw)

    tmodels.layers = layers
    tmodels.registry = registry
    tmodels.vision_transformer = vit
    timm.models = tmodels
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", tmodels)
    sys.modules.setdefault("timm.models.layers", layers)
    sys.modules.setdefault("timm.models.registry", registry)
    sys.modules.setdefault("timm.models.vision_transformer", vit)


def _fake_skimage():
    from scipy import ndimage as ndi

    skimage = types.ModuleType("skimage")
    seg = types.ModuleType("skimage.segmentation")

    def find_boundaries(label_img, connectivity=1, mode="thick", background=0):
        lab = np.asarray(label_img)
        foot = ndi.generate_binary_structure(lab.ndim, connectivity)
        fg = lab != background
        if mode == "inner":
            # skimage: erosion pads with max -> image borders never count
            ero = ndi.binary_erosion(fg, structure=foot, border_value=1)
            return fg & ~ero
        if mode == "outer":
            dil = ndi.binary_dilation(fg, structure=foot, border_value=0)
            return dil & ~fg
        # thick
        ero = ndi.binary_erosion(fg, structure=foot, border_value=1)
        dil = ndi.binary_dilation(fg, structure=foot, border_value=0)
        return dil & ~ero

    seg.find_boundaries = find_boundaries
    skimage.segmentation = seg

    draw = types.ModuleType("skimage.draw")

    def disk(center, radius, shape=None):
        # skimage.draw.disk == ellipse(r, c, radius, radius): strict < 1
        r0, c0 = center
        size = int(np.ceil(radius)) * 2 + 1
        rr, cc = np.mgrid[: size + int(r0), : size + int(c0)]
        mask = ((rr - r0) / radius) ** 2 + ((cc - c0) / radius) ** 2 < 1.0
        rr, cc = np.nonzero(mask)
        if shape is not None:
            keep = (rr < shape[0]) & (cc < shape[1])
            rr, cc = rr[keep], cc[keep]
        return rr, cc

    draw.disk = disk
    skimage.draw = draw
    sys.modules.setdefault("skimage", skimage)
    sys.modules.setdefault("skimage.segmentation", seg)
    sys.modules.setdefault("skimage.draw", draw)


def _fake_torch_thnn():
    """`extensions/pacnet/pac.py:23` imports the torch-0.4-era
    `torch._thnn.type2backend` and stashes `type2backend[input.type()]` on
    the autograd ctx in every Function FORWARD (pac.py:109,158,237,324); the
    backend is only *used* in the legacy backward paths, so a permissive
    lookup stub keeps the forward oracle honest on modern torch."""
    import torch

    if hasattr(torch, "_thnn") and "torch._thnn" in sys.modules:
        return

    class _Type2Backend:
        def __getitem__(self, _type_str):
            return None

    thnn = types.ModuleType("torch._thnn")
    thnn.type2backend = _Type2Backend()
    sys.modules["torch._thnn"] = thnn


def _fake_openseg_lib():
    """The openseg-vendored nets import their own modules by the upstream
    absolute package name `lib.models.*` (`nets/hrnet.py:66,123`,
    `nets/ocrnet.py:15-16,41,89`, `nets/fcnet.py:17-18`), which does not
    exist in the reference tree — alias those names to the identical
    vendored modules under `model.modeling.hrnet_ocr.*`."""
    import importlib

    if "lib.models.modules.spatial_ocr_block" in sys.modules:
        return
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    pairs = {
        "lib.models.modules.spatial_ocr_block":
            "model.modeling.hrnet_ocr.modules.spatial_ocr_block",
        "lib.models.backbones.backbone_selector":
            "model.modeling.hrnet_ocr.backbones.backbone_selector",
        "lib.models.tools.module_helper":
            "model.modeling.hrnet_ocr.tools.module_helper",
    }
    for alias in ("lib", "lib.models", "lib.models.modules",
                  "lib.models.backbones", "lib.models.tools"):
        sys.modules.setdefault(alias, types.ModuleType(alias))
    for alias, real in pairs.items():
        sys.modules[alias] = importlib.import_module(real)


def _patch_cuda_to_cpu():
    import torch
    import torch.nn as nn

    if getattr(torch.Tensor.to, "_oracle_patched", False):
        return

    def _map(a):
        if isinstance(a, str) and a.startswith("cuda"):
            return "cpu"
        if isinstance(a, torch.device) and a.type == "cuda":
            return torch.device("cpu")
        return a

    orig_t_to = torch.Tensor.to

    def t_to(self, *args, **kw):
        args = tuple(_map(a) for a in args)
        if "device" in kw:
            kw["device"] = _map(kw["device"])
        return orig_t_to(self, *args, **kw)

    t_to._oracle_patched = True
    torch.Tensor.to = t_to
    torch.Tensor.cuda = lambda self, *a, **k: self

    orig_m_to = nn.Module.to

    def m_to(self, *args, **kw):
        args = tuple(_map(a) for a in args)
        if "device" in kw:
            kw["device"] = _map(kw["device"])
        return orig_m_to(self, *args, **kw)

    nn.Module.to = m_to
    nn.Module.cuda = lambda self, *a, **k: self


def _fake_wandb():
    """`model/engine/trainer.py:24` imports wandb at module level; the
    composite-loss oracle only needs `calc_loss`/`increase_w_task` from that
    module, never a live run, so a no-op logger suffices."""
    if "wandb" in sys.modules:
        return
    wandb = types.ModuleType("wandb")
    wandb.log = lambda *a, **k: None
    wandb.init = lambda *a, **k: None
    wandb.watch = lambda *a, **k: None
    sys.modules["wandb"] = wandb


def install():
    global _installed
    if _installed:
        return
    _fake_yacs()
    _fake_torchvision()
    _fake_timm()
    _fake_skimage()
    _fake_wandb()
    _fake_torch_thnn()
    _patch_cuda_to_cpu()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _installed = True


def patch_dsrl_no_imagenet():
    """DSRL's ResNet101 downloads from model_zoo at construction
    (`DSRL/backbone/resnet.py:74-146`); no egress here, and the oracle
    overwrites every weight anyway."""
    install()
    from model.modeling.DSRL.backbone import resnet

    resnet.ResNet._load_pretrained_model = lambda self: None
    resnet.model_zoo.load_url = lambda *a, **k: {}


def patch_extractors_no_imagenet():
    """PSPNet's `extractors.resnetXX(pretrained=True)` downloads from
    model_zoo (`pspnet_pytorch/extractors.py:339-371`); this box has no
    egress and the oracle overwrites every weight anyway."""
    install()
    from model.modeling.pspnet_pytorch import extractors

    extractors.load_weights_sequential = lambda target, source_state: None
    extractors.model_zoo.load_url = lambda *a, **k: {}
