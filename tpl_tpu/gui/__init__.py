from tpl_tpu.gui.main import GuiServer

__all__ = ["GuiServer"]
