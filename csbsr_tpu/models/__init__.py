from .build import CSBSRModel, model_from_cfg
from .dbpn import DBPN
from .kbpn import KBPN
from .unet import UNet16
from .pspnet import PSPNet, PSPNetBlurSkip
from .srcnet import SrcNetSR, SegNet
