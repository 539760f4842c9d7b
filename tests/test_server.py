"""ZeroMQ photon service loopback tests (reference: bin/chroma-server,
bin/chroma-server-rat protocols)."""
import threading

import numpy as np
import pytest

from chroma_tpu.geometry import Geometry, Solid, Material, Surface, vacuum
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.generator import photon_bomb

zmq = pytest.importorskip('zmq')


@pytest.fixture(scope='module')
def detector():
    water = Material('water')
    water.set('refractive_index', 1.33)
    water.set('absorption_length', 1e5)
    water.set('scattering_length', 1e5)
    black = Surface('black')
    black.set('absorb', 1)
    geo = Geometry(vacuum)
    geo.add_solid(Solid(box(1000, 1000, 1000), water, vacuum,
                        surface=black))
    return create_geometry_from_obj(geo, update_bvh_cache=False)


@pytest.mark.slow
def test_photon_server_round_trip(detector):
    from chroma_tpu.server import PhotonServer, PhotonClient

    address = 'ipc:///tmp/chroma_tpu_test_server'
    server = PhotonServer(address, detector, seed=1)
    thread = threading.Thread(target=server.serve_forever,
                              kwargs=dict(max_requests=1), daemon=True)
    thread.start()

    client = PhotonClient(address)
    photons = photon_bomb(500, 400.0, (0, 0, 0))
    result = client.propagate(photons)
    thread.join(timeout=60)

    assert len(result) == 500
    from chroma_tpu import event
    terminal = (result.flags & np.uint32(event.TERMINAL_FLAGS)) != 0
    assert terminal.all()
    client.close()
    server.close()


def test_rat_protocol_round_trip(detector):
    "Exercise the packed binary wire format end to end in-process."
    from chroma_tpu.server.rat_server import parse_request, pack_reply
    from chroma_tpu import event

    n = 100
    ph = photon_bomb(n, 400.0, (0, 0, 0))
    msg = np.asarray([n, 7], dtype=np.uint32).tobytes()
    for col in (ph.pos[:, 0], ph.pos[:, 1], ph.pos[:, 2],
                ph.dir[:, 0], ph.dir[:, 1], ph.dir[:, 2],
                ph.pol[:, 0], ph.pol[:, 1], ph.pol[:, 2],
                ph.wavelengths, ph.t):
        msg += np.ascontiguousarray(col, dtype=np.float64).tobytes()
    msg += np.arange(n, dtype=np.uint32).tobytes()

    photons, eventid, trackid = parse_request(msg)
    assert eventid == 7
    assert len(photons) == n
    np.testing.assert_allclose(photons.pos, ph.pos, rtol=1e-6)
    np.testing.assert_array_equal(trackid, np.arange(n))

    reply = pack_reply(photons[:5], np.arange(5, dtype=np.uint32), 7)
    nhits, evid = np.frombuffer(reply[:8], dtype=np.uint32)
    assert nhits == 5 and evid == 7
