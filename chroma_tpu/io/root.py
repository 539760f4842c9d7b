"""Optional PyROOT event bridge (reference: chroma/io/root.py, root.C).

Provides RootReader/RootWriter with the reference's API when PyROOT is
installed. The native dependency-free format is chroma_tpu.io.npz; this
module exists for interoperability with ROOT-based analysis chains and
raises a clear ImportError otherwise.
"""
from __future__ import annotations

import numpy as np

try:
    import ROOT  # noqa: F401
    HAS_ROOT = True
except ImportError:
    HAS_ROOT = False

_TREE_DEF = '''
struct ChromaPhoton {
    float x, y, z, dx, dy, dz, px, py, pz;
    float wavelength, t, weight;
    unsigned int flags;
    int last_hit_triangle;
};
'''


def _require_root():
    if not HAS_ROOT:
        raise ImportError(
            'PyROOT is not available; use chroma_tpu.io.npz.EventWriter / '
            'EventReader for the portable event format')


class RootWriter(object):
    "Write events to a ROOT file (flat TTree of per-photon branches)."

    def __init__(self, filename):
        _require_root()
        import ROOT
        self.file = ROOT.TFile(filename, 'RECREATE')
        self.tree = ROOT.TNtuple(
            'photons', 'photon hits',
            'event:channel:t:q:x:y:z:wavelength:flags')

    def write_event(self, ev):
        hits = ev.flat_hits
        if hits is None:
            return
        for i in range(len(hits)):
            self.tree.Fill(float(ev.id), float(hits.channel[i]),
                           float(hits.t[i]), float(hits.weights[i]),
                           float(hits.pos[i, 0]), float(hits.pos[i, 1]),
                           float(hits.pos[i, 2]),
                           float(hits.wavelengths[i]),
                           float(hits.flags[i]))

    def close(self):
        self.file.Write()
        self.file.Close()


class RootReader(object):
    "Iterate photon hits back out of a RootWriter file, grouped by event."

    def __init__(self, filename):
        _require_root()
        import ROOT
        from chroma_tpu import event as event_mod
        self.file = ROOT.TFile(filename)
        self.tree = self.file.Get('photons')
        rows = [(int(self.tree.event), int(self.tree.channel),
                 self.tree.t, self.tree.q,
                 (self.tree.x, self.tree.y, self.tree.z),
                 self.tree.wavelength, int(self.tree.flags))
                for _ in self.tree]
        events = {}
        for row in rows:
            events.setdefault(row[0], []).append(row)
        self.events = []
        for ev_id in sorted(events):
            items = events[ev_id]
            ev = event_mod.Event(id=ev_id)
            ev.flat_hits = event_mod.Photons(
                pos=np.array([i[4] for i in items]),
                dir=np.zeros((len(items), 3)),
                pol=np.zeros((len(items), 3)),
                wavelengths=np.array([i[5] for i in items]),
                t=np.array([i[2] for i in items]),
                flags=np.array([i[6] for i in items], dtype=np.uint32),
                channel=np.array([i[1] for i in items], dtype=np.uint32))
            self.events.append(ev)
        self.i = -1

    def __len__(self):
        return len(self.events)

    def __iter__(self):
        self.i = -1
        return self

    def __next__(self):
        if self.i + 1 >= len(self.events):
            raise StopIteration
        self.i += 1
        return self.events[self.i]

    def jump_to(self, i):
        if 0 <= i < len(self.events):
            self.i = i
            return self.events[i]
        return None

    def prev(self):
        return self.jump_to(self.i - 1)

    def index(self):
        return self.i
