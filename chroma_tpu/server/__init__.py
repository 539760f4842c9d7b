"""ZeroMQ photon propagation services (reference: bin/chroma-server,
bin/chroma-server-rat).

Cross-node integration stays at the host level exactly like the reference
(SURVEY §5.8): a REQ/REP socket speaking either pickled Photons objects
(PhotonServer) or the packed little-endian binary protocol used by RAT
clients (RatServer). Device-level scaling is separate and in-process
(chroma_tpu.parallel)."""
from chroma_tpu.server.photon_server import (PhotonServer,  # noqa: F401
                                             PhotonClient)
from chroma_tpu.server.rat_server import RatServer  # noqa: F401
