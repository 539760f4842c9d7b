"""Event I/O round-trip (reference test strategy: test/test_io.py)."""
import os
import tempfile

import numpy as np

from chroma_tpu import event
from chroma_tpu.generator import photon_bomb
from chroma_tpu.io import EventWriter, EventReader


def _make_event(i):
    ev = event.Event(id=i)
    ev.nphotons = 100
    ev.photons_beg = photon_bomb(100, 400.0, (0, 0, 0))
    ev.photons_end = photon_bomb(100, 450.0, (1, 1, 1))
    ev.flat_hits = photon_bomb(7, 420.0, (2, 2, 2))
    ev.flat_hits.channel = np.arange(7, dtype=np.uint32)
    nch = 20
    hit = np.zeros(nch, dtype=bool)
    hit[[1, 5, 7]] = True
    t = np.full(nch, 1e9, dtype=np.float32)
    t[hit] = [10.0, 11.0, 12.0]
    q = np.zeros(nch, dtype=np.float32)
    q[hit] = [1.0, 2.0, 0.5]
    ev.channels = event.Channels(hit, t, q,
                                 np.zeros(nch, dtype=np.uint32))
    ev.vertices = [event.Vertex('e-', np.zeros(3), np.array([0, 0, 1.0]),
                                5.0)]
    return ev


def test_round_trip():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'events.chroma')
        with EventWriter(path) as w:
            for i in range(3):
                w.write_event(_make_event(i))

        r = EventReader(path)
        assert len(r) == 3
        events = list(r)
        assert [e.id for e in events] == [0, 1, 2]

        ev = events[1]
        orig = _make_event(1)
        np.testing.assert_array_equal(ev.photons_beg.wavelengths,
                                      orig.photons_beg.wavelengths)
        np.testing.assert_array_equal(ev.channels.hit, orig.channels.hit)
        np.testing.assert_allclose(ev.channels.t[ev.channels.hit],
                                   [10.0, 11.0, 12.0])
        np.testing.assert_allclose(ev.channels.q[ev.channels.hit],
                                   [1.0, 2.0, 0.5])
        assert ev.vertices[0].particle_name == 'e-'
        assert ev.vertices[0].ke == 5.0
        assert len(ev.flat_hits) == 7

        # jump / prev navigation
        assert r.jump_to(0).id == 0
        assert r.jump_to(2).id == 2
        assert r.prev().id == 1
        assert r.jump_to(99) is None
