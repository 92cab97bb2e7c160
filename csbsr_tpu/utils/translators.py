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
    """Map (structural segment, kind) to the torch leaf name for the
    BlockBase family (`blocks.py:17-103`, `kbpn.py:192-290`): the conv lives
    in `.layer`, the norm in `.norm`, the activation in `.act`."""
    seg, kind = seg_kind
    if seg in ("conv", "deconv"):
        return {"kernel": "layer.weight", "bias": "layer.bias"}[kind]
    if seg.startswith("PReLU"):
        return "act.weight"
    if seg.startswith("BatchNorm"):
        return {"scale": "norm.weight", "bias": "norm.bias",
                "mean": "norm.running_mean", "var": "norm.running_var"}[kind]
    return None


def _base_networks_leaf(seg_kind: Tuple[str, str]) -> Optional[str]:
    """Leaf names for the `base_networks.py` block family (DBPN):
    ConvBlock keeps its conv in `.conv` (`base_networks.py:62`), DeconvBlock
    in `.deconv` (`:105`), activation `.act` (`:74-84`), batchnorm `.bn`
    (`:66`).  Caught by the reference-oracle tests: these differ from the
    BlockBase family above."""
    seg, kind = seg_kind
    if seg == "conv":
        return {"kernel": "conv.weight", "bias": "conv.bias"}[kind]
    if seg == "deconv":
        return {"kernel": "deconv.weight", "bias": "deconv.bias"}[kind]
    if seg.startswith("PReLU"):
        return "act.weight"
    if seg.startswith("BatchNorm"):
        return {"scale": "bn.weight", "bias": "bn.bias",
                "mean": "bn.running_mean", "var": "bn.running_var"}[kind]
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
    """DBPN torch names (`dbpn.py:67-135` Net_4 et al.; block family =
    `base_networks.py`, so leaves are conv./deconv./act./bn.)."""
    p = [str(x) for x in path[:-1]]
    if not p:
        return None
    head = p[0]

    def leaf(i):
        rest = p[i:]
        return _base_networks_leaf((rest[0], kind)) if rest else None

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
                "conv3": "conv3", "bn3": "bn3",  # Bottleneck backends (50/101/152)
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
    m = re.match(r"blur_skip_sft(\d+)", head)
    if m:
        # PSPNet_BlurSkip ladder (pspnet.py:142-151): ModuleList alternating
        # SFTLikeBlock (even slots) and ConvBlock (odd slots)
        i = 2 * int(m.group(1))
        mb = re.match(r"(conv_scale|conv_shift)(\d)", p[1])
        if mb:
            lf = _block_leaf((p[2], kind))
            if lf:
                return f"blur_skip.{i}.{mb.group(1)}.{mb.group(2)}.{lf}"
        return None
    m = re.match(r"blur_skip_conv(\d+)", head)
    if m:
        i = 2 * int(m.group(1)) + 1
        lf = _block_leaf((p[1], kind))
        return f"blur_skip.{i}.{lf}" if lf else None
    if head.startswith("prelu"):
        return None
    return None


_BN_SUFFIX = {
    "kernel": "weight", "bias": "bias", "scale": "weight",
    "mean": "running_mean", "var": "running_var", "alpha": "weight",
}


def translate_hrnet_ocr(path: Tuple, kind: str) -> Optional[str]:
    """HRNet_W48_OCR torch names.

    Backbone: `hrnet_ocr/backbones/hrnet/hrnet_backbone.py:295-560`
    (conv1/bn1/conv2/bn2, layer1.{b}, transition{t}.{i}[.{j}] Sequentials,
    stage{s}.{m}.branches.{i}.{b} and .fuse_layers.{i}.{j}).
    OCR head: `nets/hrnet.py:101-140` (conv3x3 / aux_head / cls_head /
    ocr_distri_head.object_context_block.f_{pixel,object,down,up} where each
    Sequential interleaves Conv2d and BNReLU=Sequential(BN, ReLU)).
    """
    p = [str(x) for x in path[:-1]]
    if not p:
        return None
    sfx = _BN_SUFFIX[kind]
    head = p[0]

    if head == "backbone":
        sub = p[1]
        if sub in ("conv1", "bn1", "conv2", "bn2"):
            return f"backbone.{sub}.{sfx}"
        m = re.match(r"layer1_(\d+)", sub)
        if m:
            inner = p[2]
            if inner == "ds_conv":
                return f"backbone.layer1.{m.group(1)}.downsample.0.{sfx}"
            if inner == "ds_bn":
                return f"backbone.layer1.{m.group(1)}.downsample.1.{sfx}"
            return f"backbone.layer1.{m.group(1)}.{inner}.{sfx}"
        m = re.match(r"transition(\d)_(\d+)_(conv|bn)(\d*)", sub)
        if m:
            t, i, kindc, j = m.groups()
            slot = "0" if kindc == "conv" else "1"
            if j == "":
                return f"backbone.transition{t}.{i}.{slot}.{sfx}"
            return f"backbone.transition{t}.{i}.{j}.{slot}.{sfx}"
        m = re.match(r"stage(\d)_m(\d+)", sub)
        if m:
            s, mod = m.groups()
            inner = p[2]
            mb = re.match(r"branch(\d+)_block(\d+)", inner)
            if mb:
                i, b = mb.groups()
                leafname = p[3]
                if leafname == "ds_conv":
                    return f"backbone.stage{s}.{mod}.branches.{i}.{b}.downsample.0.{sfx}"
                if leafname == "ds_bn":
                    return f"backbone.stage{s}.{mod}.branches.{i}.{b}.downsample.1.{sfx}"
                return f"backbone.stage{s}.{mod}.branches.{i}.{b}.{leafname}.{sfx}"
            mf = re.match(r"fuse(\d+)_(\d+)_(conv|bn)(\d*)", inner)
            if mf:
                i, j, kindc, k = mf.groups()
                slot = "0" if kindc == "conv" else "1"
                base = f"backbone.stage{s}.{mod}.fuse_layers.{i}.{j}"
                if k == "":  # j > i: Sequential(Conv, BN)
                    return f"{base}.{slot}.{sfx}"
                return f"{base}.{k}.{slot}.{sfx}"  # j < i: nested Sequentials
        return None

    if head == "aux_conv0":
        return f"aux_head.0.{sfx}"
    if head == "aux_bn":
        return f"aux_head.1.0.{sfx}"
    if head == "aux_conv1":
        return f"aux_head.2.{sfx}"
    if head == "conv3x3":
        return f"conv3x3.0.{sfx}"
    if head == "conv3x3_bn":
        return f"conv3x3.1.0.{sfx}"
    if head == "cls_head":
        return f"cls_head.{sfx}"
    if head == "ocr_distri_head":
        sub = p[1]
        if sub == "conv":
            return f"ocr_distri_head.conv_bn_dropout.0.{sfx}"
        if sub == "bn":
            return f"ocr_distri_head.conv_bn_dropout.1.0.{sfx}"
        if sub == "oab":
            t = _oab_leaf(p[2], sfx)
            if t:
                return f"ocr_distri_head.object_context_block.{t}"

    # sibling heads (`nets/hrnet.py:22-99`): HRNet_W48's plain FCN cls_head
    # Sequential(Conv, BNReLU, Dropout, Conv) and HRNet_W48_ASPOCR's
    # SpatialOCR_ASP_Module (spatial_ocr_block.py:325-383); HRNet_W48_OCR_B
    # reuses the names above with its own widths.
    if head == "cls_conv0":
        return f"cls_head.0.{sfx}"
    if head == "cls_bn":
        return f"cls_head.1.0.{sfx}"
    if head == "cls_conv1":
        return f"cls_head.3.{sfx}"
    if head == "asp_ocr_head":
        sub = p[1]
        if sub == "context_pre_conv":
            return f"asp_ocr_head.context.0.{sfx}"
        if sub == "context_pre_bn":
            return f"asp_ocr_head.context.1.0.{sfx}"
        if sub == "context_oab":
            t = _oab_leaf(p[2], sfx)
            if t:
                return f"asp_ocr_head.context.2.object_context_block.{t}"
        m = re.match(r"conv(\d)_(conv|bn)", sub)
        if m:
            i, kindc = m.groups()
            slot = "0" if kindc == "conv" else "1.0"
            return f"asp_ocr_head.conv{i}.{slot}.{sfx}"
        if sub == "project_conv":
            return f"asp_ocr_head.conv_bn_dropout.0.{sfx}"
        if sub == "project_bn":
            return f"asp_ocr_head.conv_bn_dropout.1.0.{sfx}"
    return None


def _oab_leaf(seg: str, sfx: str) -> Optional[str]:
    """ObjectAttentionBlock2D leaf (`spatial_ocr_block.py:145-170`): each
    f_{pixel,object,down,up} is a Sequential interleaving Conv2d and
    BNReLU=Sequential(BN, ReLU): conv i -> slot 2i, bn i -> slot 2i+1 + .0."""
    m = re.match(r"(f_pixel|f_object|f_down|f_up)_(conv|bn)(\d)", seg)
    if not m:
        return None
    fname, kindc, idx = m.groups()
    slot = 2 * int(idx) + (0 if kindc == "conv" else 1)
    tail = f"{slot}.{sfx}" if kindc == "conv" else f"{slot}.0.{sfx}"
    return f"{fname}.{tail}"


def translate_openseg_resnet(path: Tuple, kind: str) -> Optional[str]:
    """Dormant openseg nets over the ResNet backbone zoo.

    Backbone: `backbones/resnet/resnet_models.py:107-163` (resinit
    Sequential with OrderedDict names conv1/bn1[/conv2/bn2/conv3/bn3],
    layerL.B.{conv1..3,bn1..3,downsample.0/1}) wrapped by Normal/Dilated
    ResnetBackbone (`resnet_backbone.py:21-117` — pure renaming, no params).
    Heads: SpatialOCRNet (`nets/ocrnet.py:19-67`: conv_3x3 / dsn_head /
    spatial_ocr_head / head) and FcnNet (`nets/fcnet.py:21-71`: cls_head /
    dsn_head Sequentials).
    """
    p = [str(x) for x in path[:-1]]
    if not p:
        return None
    sfx = _BN_SUFFIX[kind]
    head = p[0]

    if head == "backbone":
        sub = p[1]
        m = re.match(r"stem(\d)_(conv|bn)", sub)
        if m:  # deep-base 3-conv stem
            i, kindc = m.groups()
            return f"backbone.resinit.{kindc}{i}.{sfx}"
        if sub == "stem_conv":
            return f"backbone.resinit.conv1.{sfx}"
        if sub == "stem_bn":
            return f"backbone.resinit.bn1.{sfx}"
        m = re.match(r"layer(\d)_(\d+)", sub)
        if m:
            l, b = m.groups()
            inner = p[2]
            if inner == "ds_conv":
                return f"backbone.layer{l}.{b}.downsample.0.{sfx}"
            if inner == "ds_bn":
                return f"backbone.layer{l}.{b}.downsample.1.{sfx}"
            return f"backbone.layer{l}.{b}.{inner}.{sfx}"
        return None

    # ASPOCRNet (ocrnet.py:70-111): same SpatialOCR_ASP_Module subtree as
    # HRNet_W48_ASPOCR, rooted at asp_ocr_head
    if head == "asp_ocr_head":
        t = translate_hrnet_ocr(path, kind)
        if t:
            return t
        return None

    # SpatialOCRNet (ocrnet.py:36-56)
    if head == "conv_3x3_conv":
        return f"conv_3x3.0.{sfx}"
    if head == "conv_3x3_bn":
        return f"conv_3x3.1.0.{sfx}"
    if head == "head":
        return f"head.{sfx}"
    if head == "spatial_ocr_head":
        sub = p[1]
        if sub == "conv":
            return f"spatial_ocr_head.conv_bn_dropout.0.{sfx}"
        if sub == "bn":
            return f"spatial_ocr_head.conv_bn_dropout.1.0.{sfx}"
        if sub == "oab":
            t = _oab_leaf(p[2], sfx)
            if t:
                return f"spatial_ocr_head.object_context_block.{t}"
        return None
    # dsn head (_ResNetNet.dsn): Sequential(Conv, BNReLU, Dropout, Conv)
    if head == "dsn_conv":
        return f"dsn_head.0.{sfx}"
    if head == "dsn_bn":
        return f"dsn_head.1.0.{sfx}"
    if head == "dsn_cls":
        return f"dsn_head.3.{sfx}"
    # FcnNet heads
    if head == "cls_head_conv":
        return f"cls_head.0.{sfx}"
    if head == "cls_head_bn":
        return f"cls_head.1.0.{sfx}"
    if head == "cls":
        return f"cls_head.3.{sfx}"
    if head == "dsn_head_conv":
        return f"dsn_head.0.{sfx}"
    if head == "dsn_head_bn":
        return f"dsn_head.1.0.{sfx}"
    return None


def translate_crackformer(path: Tuple, kind: str) -> Optional[str]:
    """CrackFormer torch names (`crackformer.py:421-488,155-260`).

    Trans_EB at flax `downX_nnY`/`upX_nnY` -> torch `downX.nnY.conv.*`
    (Bottleneck); the TFBlock lives in `conv2.0`; LocalSABlock q/k/v are
    Sequential(Conv, GroupNorm); the positional embedding is a 5-D parameter
    (kk, u=1, 1, m, m).
    """
    p = [str(x) for x in path[:-1]]
    if not p:
        return None
    sfx = _BN_SUFFIX["kernel" if kind == "embedding" else kind]
    head = p[0]

    if head == "final":
        return f"final.{sfx}"
    if head == "down1_nn1":  # ConvRelu: .conv is a bare Conv2d
        return f"down1.nn1.conv.{sfx}"
    m = re.match(r"(down|up)(\d)_nn(\d)", head)
    if m and len(p) >= 3 and p[1] == "conv":
        # flax TransEB wraps Bottleneck under 'conv' (= torch Trans_EB.conv)
        base = f"{m.group(1)}{m.group(2)}.nn{m.group(3)}.conv"
        sub = p[2]
        if sub in ("conv1", "bn1", "conv3", "bn3"):
            return f"{base}.{sub}.{sfx}"
        if sub == "shortcut_conv":
            return f"{base}.shortcut.0.{sfx}"
        if sub == "shortcut_gn":
            return f"{base}.shortcut.1.{sfx}"
        if sub == "tf":  # TFBlock at conv2.0
            tf = f"{base}.conv2.0"
            inner = p[3]
            if inner == "attn":
                leafname = str(path[-1])
                if leafname == "embedding":
                    return f"{tf}.attn.embedding"
                ma = re.match(r"(queries|keys|values)_(conv|gn)", p[4])
                if ma:
                    slot = "0" if ma.group(2) == "conv" else "1"
                    return f"{tf}.attn.{ma.group(1)}.{slot}.{sfx}"
                return None
            if inner == "mlp":
                sub2 = p[4]
                if sub2 == "dwconv":
                    return f"{tf}.mlp.dwconv.dwconv.{sfx}"
                if sub2 in ("fc1", "fc2", "gn1", "gn2", "gn3"):
                    return f"{tf}.mlp.{sub2}.{sfx}"
        return None
    m = re.match(r"LABlock_(\d)", head)
    if m:
        sub = p[1]
        table = {"W1_conv": "W_1.0", "W1_gn": "W_1.1", "psi_conv": "psi.0", "psi_gn": "psi.1"}
        if sub in table:
            return f"LABlock_{m.group(1)}.{table[sub]}.{sfx}"
        return None
    m = re.match(r"fuse(\d)", head)
    if m:
        sub = p[1]
        if sub == "nn_conv":  # Fuse.nn = ConvRelu(...).conv is passed in as `nn`
            return f"fuse{m.group(1)}.nn.conv.{sfx}"
        if sub == "conv":
            return f"fuse{m.group(1)}.conv.{sfx}"
    return None


def translate_srcnet_sr(path: Tuple, kind: str) -> Optional[str]:
    """SrcNetSR torch names (`srcnet.py:26-86`): rir.res_groups.{g}.res_blocks.{b}."""
    p = [str(x) for x in path[:-1]]
    if not p:
        return None
    sfx = _BN_SUFFIX[kind]
    head = p[0]
    if head in ("sconv1", "sconv2", "upscaling"):
        return f"{head}.{sfx}"
    if head == "rir_conv":
        return f"rir.conv.{sfx}"
    m = re.match(r"rg(\d+)_conv", head)
    if m:
        return f"rir.res_groups.{m.group(1)}.conv.{sfx}"
    m = re.match(r"rg(\d+)_rb(\d+)", head)
    if m:
        g, b = m.groups()
        base = f"rir.res_groups.{g}.res_blocks.{b}"
        table = {"fe1_0": "fe1.0", "fe1_1": "fe1.2", "att_0": "attention.1", "att_1": "attention.3"}
        sub = p[1]
        if sub in table:
            return f"{base}.{table[sub]}.{sfx}"
    return None


def translate_segnet(path: Tuple, kind: str) -> Optional[str]:
    """SegNet torch names (`srcnet.py:91-260`).

    The reference applies decoder convs in descending index order
    (ConvDe53 -> ConvDe52 -> ConvDe51, forward `srcnet.py:218-243`); our
    flax names are in application order, so flax De{s}{j} (1-based, n convs
    in stage s) maps to torch De{s}{n+1-j}.  The final 1x1 flax `convDe1f`
    is torch `ConvDe11` (whose declared BNDe11 is unused in forward).
    """
    p = [str(x) for x in path[:-1]]
    if not p:
        return None
    sfx = _BN_SUFFIX[kind]
    n_convs = {"En1": 2, "En2": 2, "En3": 3, "En4": 3, "En5": 3,
               "De5": 3, "De4": 3, "De3": 3, "De2": 2, "De1": 1}
    head = p[0]
    if head == "convDe1f":
        return f"ConvDe11.{sfx}"
    m = re.match(r"(conv|bn)(En|De)(\d)(\d)", head)
    if m:
        kindc, phase, s, j = m.groups()
        tname = "Conv" if kindc == "conv" else "BN"
        if phase == "En":
            return f"{tname}En{s}{j}.{sfx}"
        n = n_convs[f"De{s}"]
        jj = n + 1 - int(j)
        if s == "1":
            jj = 2  # flax De11 is torch ConvDe12 (ConvDe11 is the final 1x1)
        return f"{tname}De{s}{jj}.{sfx}"
    return None


def make_translate_dsrl(scale_factor: int = 4):
    """DSRL torch names (`DSRL/deeplab.py:29-180`, `aspp.py`, `decoder.py`,
    `sr_decoder.py`, `backbone/resnet.py`).

    DeepLab (x2) names its deconv chain up_sr_1..3; DeepLabx4 up_sr_0..3 -
    the flax chain is 0-based in application order, hence the offset."""
    offset = 0 if scale_factor == 4 else 1

    def translate(path: Tuple, kind: str) -> Optional[str]:
        p = [str(x) for x in path[:-1]]
        if not p:
            return None
        sfx = _BN_SUFFIX[kind]
        head = p[0]
        if head == "backbone":
            sub = p[1]
            if sub in ("conv1", "bn1"):
                return f"backbone.{sub}.{sfx}"
            # DRN-D-54 (drn.py): layer0 Sequential(conv, BN, relu); conv-stack
            # layers i -> Sequential indices 3i (conv) / 3i+1 (BN)
            if sub == "layer0_conv":
                return f"backbone.layer0.0.{sfx}"
            if sub == "layer0_bn":
                return f"backbone.layer0.1.{sfx}"
            m = re.match(r"layer(\d)_conv(\d)", sub)
            if m:
                return f"backbone.layer{m.group(1)}.{3 * int(m.group(2))}.{sfx}"
            m = re.match(r"layer(\d)_bn(\d)", sub)
            if m:
                return f"backbone.layer{m.group(1)}.{3 * int(m.group(2)) + 1}.{sfx}"
            m = re.match(r"layer(\d)_(\d+)", sub)
            if m:
                lay, b = m.groups()
                inner = p[2]
                if inner == "ds_conv":
                    return f"backbone.layer{lay}.{b}.downsample.0.{sfx}"
                if inner == "ds_bn":
                    return f"backbone.layer{lay}.{b}.downsample.1.{sfx}"
                return f"backbone.layer{lay}.{b}.{inner}.{sfx}"
            return None
        if head == "aspp":
            sub = p[1]
            m = re.match(r"aspp(\d)_(conv|bn)", sub)
            if m:
                i, kindc = m.groups()
                leafn = "atrous_conv" if kindc == "conv" else "bn"
                return f"aspp.aspp{i}.{leafn}.{sfx}"
            if sub == "gap_conv":
                return f"aspp.global_avg_pool.1.{sfx}"
            if sub == "gap_bn":
                return f"aspp.global_avg_pool.2.{sfx}"
            if sub in ("conv1", "bn1"):
                return f"aspp.{sub}.{sfx}"
            return None
        if head in ("decoder", "sr_decoder"):
            sub = p[1]
            table = {"conv1": "conv1", "bn1": "bn1", "last0": "last_conv.0",
                     "last0_bn": "last_conv.1", "last1": "last_conv.4",
                     "last1_bn": "last_conv.5", "last2": "last_conv.8"}
            if sub in table:
                return f"{head}.{table[sub]}.{sfx}"
            return None
        m = re.match(r"up_sr_(\d)", head)
        if m:
            return f"up_sr_{int(m.group(1)) + offset}.{sfx}"
        m = re.match(r"up_edsr_(\d)", head)
        if m:
            i = int(m.group(1)) + offset
            sub = p[1]
            table = {"conv0": "conv.0", "conv1": "conv.2", "res": "residual_upsampler.0"}
            if sub in table:
                return f"up_edsr_{i}.{table[sub]}.{sfx}"
            return None
        if head == "up_conv_last":
            return f"up_conv_last.{sfx}"
        if head == "pointwise_conv":
            return f"pointwise.0.{sfx}"
        if head == "pointwise_bn":
            return f"pointwise.1.{sfx}"
        return None

    return translate


translate_dsrl = make_translate_dsrl(4)


# --------------------------------------------------------------------------
# ImageNet-backbone translators: flax path -> torchvision / upstream-release
# checkpoint key. These inject the published initialisations the reference
# downloads at construction time (VGG16 `kbpn.py:42-44` + `unet.py:143-176`,
# ResNet `extractors.py:14-34,158-163`, HRNet-W48
# `H_48_D_4_composite.json:84`).
# --------------------------------------------------------------------------


def imagenet_vgg16_kbpn_feat(path: Tuple, kind: str) -> Optional[str]:
    """KBPN 'feat' head <- torchvision vgg16: the reference drops the first
    MaxPool (vgg[:4]+vgg[5:9], kbpn.py:42-44), so feat convs 0..3 come from
    features indices 0, 2, 5, 7."""
    p = [str(x) for x in path[:-1]]
    if len(p) < 2 or p[0] != "feat":
        return None
    m = re.match(r"conv(\d)", p[1])
    if not m:
        return None
    idx = (0, 2, 5, 7)[int(m.group(1))]
    return f"features.{idx}.{'weight' if kind == 'kernel' else 'bias'}"


_UNET16_VGG_FEATURE_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def imagenet_vgg16_unet16(path: Tuple, kind: str) -> Optional[str]:
    """UNet16 encoder <- torchvision vgg16.features (unet.py:143-176)."""
    p = [str(x) for x in path[:-1]]
    if not p:
        return None
    m = re.match(r"enc(\d+)", p[0])
    if not m:
        return None
    idx = _UNET16_VGG_FEATURE_IDX[int(m.group(1))]
    return f"features.{idx}.{'weight' if kind == 'kernel' else 'bias'}"


def imagenet_resnet_pspnet(path: Tuple, kind: str) -> Optional[str]:
    """PSPNet 'feats' extractor <- torchvision resnet34 (identical module
    names minus the feats. prefix; extractors.py:112-163)."""
    t = translate_pspnet(path, kind)
    if t and t.startswith("feats."):
        return t[len("feats."):]
    return None


def imagenet_hrnet_w48(path: Tuple, kind: str) -> Optional[str]:
    """HRNet-W48 backbone <- hrnetv2_w48_imagenet_pretrained.pth (same
    backbone names minus the backbone. prefix; the checkpoint's
    classification head keys are simply unused)."""
    t = translate_hrnet_ocr(path, kind)
    if t and t.startswith("backbone."):
        return t[len("backbone."):]
    return None


def imagenet_resnet_dsrl(path: Tuple, kind: str) -> Optional[str]:
    """DSRL DeepLab backbone <- torchvision resnet101 (DSRL/backbone/resnet.py
    mirrors torchvision names)."""
    t = translate_dsrl(path, kind)
    if t and t.startswith("backbone."):
        return t[len("backbone."):]
    return None
