from .node import CfgNode
from .defaults import get_cfg_defaults

cfg = get_cfg_defaults()

__all__ = ["CfgNode", "cfg", "get_cfg_defaults"]
