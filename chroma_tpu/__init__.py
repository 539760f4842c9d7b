"""chroma_tpu: a TPU-native optical photon Monte Carlo framework.

A ground-up JAX/XLA/Pallas rebuild of the Chroma GPU photon transport
engine (reference: youngsm/chroma-lite): triangle-mesh detector geometry
with full surface/bulk optical physics, BVH-accelerated ray intersection,
PMT DAQ simulation, hybrid-MC likelihood/PDF evaluation, and a ray-traced
viewer — redesigned for TPUs as mask-predicated lockstep array programs
with functional scatter-reductions and shard_map multi-chip scaling.
"""

__version__ = '0.1.0'

from chroma_tpu import event  # noqa: F401
from chroma_tpu.event import Photons, Vertex, Event, Channels  # noqa: F401
from chroma_tpu.geometry import (Mesh, Solid, Material, Surface,  # noqa: F401
                                 Geometry, DichroicProps, AngularProps,
                                 WirePlane, vacuum, standard_wavelengths)
from chroma_tpu.detector import Detector  # noqa: F401
from chroma_tpu import make  # noqa: F401
from chroma_tpu.stl import mesh_from_stl  # noqa: F401
from chroma_tpu.loader import (load_geometry_from_string,  # noqa: F401
                               create_geometry_from_obj, load_bvh)
from chroma_tpu.cache import Cache  # noqa: F401
from chroma_tpu.log import logger  # noqa: F401


def __getattr__(name):
    # heavyweight subsystems load lazily so that host-only use (geometry
    # building, caching) never initializes JAX
    if name == 'Simulation':
        from chroma_tpu.sim import Simulation
        return Simulation
    if name == 'Likelihood':
        from chroma_tpu.likelihood import Likelihood
        return Likelihood
    raise AttributeError('module %r has no attribute %r' % (__name__, name))
