"""Ellipsoid constants (reference: cadastre-pg/src/reproject_lite/ellipsoid.rs:4-35).

Constants are module-level (hoisted once), unlike the reference's
Lambert path which recomputes projection constants per point
(lambert.rs:74-90) — see SURVEY.md §4 "constant (non-)folding".
"""

import math


class Ellipsoid:
    __slots__ = ("a", "f", "b", "e2", "e", "ep2")

    def __init__(self, a: float, inv_f: float):
        self.a = a
        self.f = 1.0 / inv_f
        self.b = a * (1.0 - self.f)
        self.e2 = 2.0 * self.f - self.f * self.f
        self.e = math.sqrt(self.e2)
        self.ep2 = self.e2 / (1.0 - self.e2)


WGS84 = Ellipsoid(6378137.0, 298.257223563)
GRS80 = Ellipsoid(6378137.0, 298.257222101)
