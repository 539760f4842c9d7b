"""chroma_tpu.parallel: multi-chip photon sharding over a device mesh."""
from chroma_tpu.parallel.sharding import (photon_mesh,  # noqa: F401
                                          propagate_sharded,
                                          propagate_and_daq_sharded,
                                          photon_channels_sharded,
                                          pad_to_mesh,
                                          reduce_channel_arrays)
