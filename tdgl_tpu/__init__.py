"""tdgl_tpu: a TPU-native time-dependent Ginzburg-Landau framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of pyTDGL
(reference: loganbvh/py-tdgl): finite-volume gTDGL dynamics of superconducting
thin films on unstructured triangular meshes, with transport terminals,
magnetic screening, post-processing and visualization.
"""

from .geometry import box, circle, ellipse, close_curve, path_vectors, rotate
from .parameter import CompositeParameter, Constant, Parameter
from .utils.units import Quantity, UnitRegistry, ureg
from .version import __version__, __version_info__
