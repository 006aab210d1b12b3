"""LAMMPS-style trajectory dump writer (`dump atom/custom` text format),
readable by OVITO/VMD like the reference workflows expect
(stgb README recommends OVITO for its outputs)."""
from __future__ import annotations

import numpy as np


class DumpWriter:
    """Appends `ITEM:`-block snapshots to a .lammpstrj file."""

    def __init__(self, path: str, types=None):
        self.path = path
        self.types = types
        self._fh = open(path, "w")

    def write(self, step: int, x, box, v=None, box_lo=None):
        x = np.asarray(x)
        box = np.asarray(box)
        lo = np.zeros(3) if box_lo is None else np.asarray(box_lo)
        n = len(x)
        fh = self._fh
        fh.write("ITEM: TIMESTEP\n%d\n" % step)
        fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % n)
        fh.write("ITEM: BOX BOUNDS pp pp pp\n")
        for d in range(3):
            fh.write("%.10g %.10g\n" % (lo[d], lo[d] + box[d]))
        cols = "id type x y z" + (" vx vy vz" if v is not None else "")
        fh.write("ITEM: ATOMS %s\n" % cols)
        types = self.types if self.types is not None else np.ones(n, int)
        if v is None:
            for i in range(n):
                fh.write("%d %d %.8g %.8g %.8g\n"
                         % (i + 1, types[i], x[i, 0], x[i, 1], x[i, 2]))
        else:
            v = np.asarray(v)
            for i in range(n):
                fh.write("%d %d %.8g %.8g %.8g %.8g %.8g %.8g\n"
                         % (i + 1, types[i], x[i, 0], x[i, 1], x[i, 2],
                            v[i, 0], v[i, 1], v[i, 2]))
        fh.flush()

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
