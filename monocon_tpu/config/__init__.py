from .defaults import ConfigNode, get_default_cfg, load_cfg, export_cfg

__all__ = ["ConfigNode", "get_default_cfg", "load_cfg", "export_cfg"]
