"""flax-path -> torch-key translators for the CSBSR model zoo.

Used by utils.torch_convert to load the reference's released checkpoints
(`build_model.py:96-110,345-349`: weights/pretrain/KBPN_pretrain_x4_stage4.pth
etc.) and ImageNet backbones.  Torch module names are read off the reference
sources cited per function.

Conventions of our blocks:
  ConvBlock  <name>/conv/kernel[,bias] + optional <name>/PReLU_0/alpha
  DeconvBlock <name>/deconv/kernel[,bias] + optional <name>/PReLU_0/alpha
  torch BlockBase: <name>.layer.weight[,bias] + <name>.act.weight (PReLU)
"""
from __future__ import annotations

import re
from typing import Optional, Tuple


def _block_leaf(seg_kind: Tuple[str, str]) -> Optional[str]:
    """Map (structural segment, kind) to the torch leaf name."""
    seg, kind = seg_kind
    if seg in ("conv", "deconv"):
        return {"kernel": "layer.weight", "bias": "layer.bias"}[kind]
    if seg.startswith("PReLU"):
        return "act.weight"
    return None


def translate_kbpn(path: Tuple, kind: str) -> Optional[str]:
    """KBPN torch names (`kbpn.py:17-155,344-602`).

    Stage modules live in back_projection_stages.<s-1>.{up,kb,down,sft}.
    """
    p = [str(x) for x in path[:-1]]
    if not p:
        return None

    def leaf(i):
        # remaining segments after position i map through the block convention
        rest = p[i:]
        if not rest:
            return None
        return _block_leaf((rest[0], kind))

    head = p[0]
    if head == "feat":
        m = re.match(r"conv(\d)", p[1])
        if not m:
            return None
        return f"feat.{int(m.group(1)) * 2}.{'weight' if kind == 'kernel' else 'bias'}"
    if head == "predictor":
        m = re.match(r"feat_ext(\d)", p[1])
        if m:
            lf = leaf(2)
            return f"predictor.feat_ext.{m.group(1)}.{lf}" if lf else None
        return None
    if head == "output_conv":
        lf = leaf(1)
        return f"output_conv.{lf}" if lf else None

    m = re.match(r"stage(\d+)_(up|down|kb|sft)", head)
    if not m:
        return None
    s = int(m.group(1)) - 1
    part = m.group(2)
    base = f"back_projection_stages.{s}.{ {'up': 'up', 'down': 'down', 'kb': 'kb', 'sft': 'sft'}[part] }"

    if part == "sft":
        # nn.Conv params directly under SFT_*_conv{0,1}
        conv_name = p[1]
        return f"{base}.{conv_name}.{'weight' if kind == 'kernel' else 'bias'}"

    sub = p[1]
    if part in ("up", "down"):
        # KBPNUp/DownBlock submodules: conv, up_conv1..3 / down_conv1..3
        lf = leaf(2)
        return f"{base}.{sub}.{lf}" if lf else None

    # kb: sr_reconst, kernel_predictor.{fe_SR,fe_kernel,fe_cat}{i}, up_conv1
    if sub == "sr_reconst" or sub == "up_conv1" or sub == "conv":
        lf = leaf(2)
        return f"{base}.{sub}.{lf}" if lf else None
    if sub == "kernel_predictor":
        m2 = re.match(r"(fe_SR|fe_kernel|fe_cat)(\d)", p[2])
        if m2:
            lf = leaf(3)
            return f"{base}.kernel_predictor.{m2.group(1)}.{m2.group(2)}.{lf}" if lf else None
        if p[2].startswith("pad_disc"):
            idx = {"pad_disc0": 0, "pad_disc1": 3, "pad_disc2": 6}[p[2]]
            return f"{base}.kernel_predictor.pad_descriminator.{idx}.{'weight' if kind == 'kernel' else 'bias'}"
    return None


def translate_dbpn(path: Tuple, kind: str) -> Optional[str]:
    """DBPN torch names (`dbpn.py:67-135` Net_4 et al.)."""
    p = [str(x) for x in path[:-1]]
    if not p:
        return None
    head = p[0]

    def leaf(i):
        rest = p[i:]
        return _block_leaf((rest[0], kind)) if rest else None

    if head in ("feat0", "feat1", "output_conv"):
        lf = leaf(1)
        return f"{head}.{lf}" if lf else None
    m = re.match(r"(up|down)(\d+)", head)
    if m:
        sub = p[1]  # conv / up_conv1.. / down_conv1..
        lf = leaf(2)
        return f"{head}.{sub}.{lf}" if lf else None
    return None


def translate_unet16(path: Tuple, kind: str) -> Optional[str]:
    """UNet16 torch names (`unet.py:124-186`): encoder convs are
    conv{1..5}.{seq_idx}; decoders DecoderBlockV2 'block' sequentials."""
    p = [str(x) for x in path[:-1]]
    if not p:
        return None
    head = p[0]
    suffix = "weight" if kind == "kernel" else "bias"

    m = re.match(r"enc(\d+)", head)
    if m:
        i = int(m.group(1))
        # encoder layout: conv1: enc0,enc1 -> conv1.{0,2}; conv2: enc2,enc3 ->
        # conv2.{0,2}; conv3: enc4..6 -> conv3.{0,2,4}; conv4: enc7..9; conv5: enc10..12
        table = (
            [("conv1", 0), ("conv1", 2), ("conv2", 0), ("conv2", 2)]
            + [("conv3", j) for j in (0, 2, 4)]
            + [("conv4", j) for j in (0, 2, 4)]
            + [("conv5", j) for j in (0, 2, 4)]
        )
        blk, idx = table[i]
        return f"{blk}.{idx}.{suffix}"
    if head in ("center", "dec4", "dec3", "dec2"):
        sub = p[1]
        if sub == "conv":  # ConvRelu inside block: block.0.conv
            return f"{head}.block.0.conv.{suffix}"
        if sub == "deconv":
            return f"{head}.block.1.{suffix}"
        if sub == "conv1":
            return f"{head}.block.1.conv.{suffix}"
        if sub == "conv2":
            return f"{head}.block.2.conv.{suffix}"
    if head == "dec1":
        return f"dec1.conv.{suffix}"
    if head == "final":
        return f"final.{suffix}"
    return None


def translate_pspnet(path: Tuple, kind: str) -> Optional[str]:
    """PSPNet torch names (`pspnet_pytorch/pspnet.py:60-125`,
    `extractors.py:112-161`)."""
    p = [str(x) for x in path[:-1]]
    if not p:
        return None
    head = p[0]
    suffix = {
        "kernel": "weight", "bias": "bias", "scale": "weight",
        "mean": "running_mean", "var": "running_var", "alpha": "weight",
    }[kind]

    if head == "feats":
        sub = p[1]
        if sub in ("conv1", "bn1"):
            return f"feats.{sub}.{suffix}"
        m = re.match(r"layer(\d)_(\d+)", sub)
        if m:
            layer, blk = m.group(1), m.group(2)
            inner = p[2]
            name_map = {
                "conv1": "conv1", "bn1": "bn1", "conv2": "conv2", "bn2": "bn2",
                "downsample_conv": "downsample.0", "downsample_bn": "downsample.1",
            }
            return f"feats.layer{layer}.{blk}.{name_map[inner]}.{suffix}"
        return None
    if head == "psp":
        sub = p[1]
        m = re.match(r"stage(\d)", sub)
        if m:
            return f"psp.stages.{m.group(1)}.1.{suffix}"
        if sub == "bottleneck":
            return f"psp.bottleneck.{suffix}"
        return None
    m = re.match(r"up_(\d)", head)
    if m:
        sub = p[1]
        idx = {"conv": 0, "bn": 1, "prelu": 2, "PReLU_0": 2}.get(sub)
        # torch PSPUpsample: conv = Sequential(Conv2d, BN, PReLU)
        return f"up_{m.group(1)}.conv.{idx}.{suffix}"
    if head == "final":
        return f"final.0.{suffix}"
    if head == "aux":
        sub = p[1]
        idx = {"conv0": 0, "bn": 1, "conv1": 4}[sub]
        return f"aux.{idx}.{suffix}"
    if head.startswith("prelu"):
        return None
    return None
