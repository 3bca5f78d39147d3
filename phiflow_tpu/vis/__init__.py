"""phiflow_tpu.vis — visualization & interactive tooling
(reference: /root/reference/phi/vis/, SURVEY.md §2.5).

Matplotlib backend + console ASCII plots + scene scalar logging + Viewer.
"""
from ._vis import plot, show, show_hist, close, control, action, overlay, write_image, plot_scalars, smooth
from ._vis_base import VisModel, Control, Action, benchmark, play_async, Recipe, PlottingLibrary, Gui
from ._viewer import Viewer, Record, view, create_viewer
from ._log import SceneLog, load_scalars
from ._web import WebGui, web_view
from . import _console as console
