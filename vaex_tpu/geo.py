"""Coordinate-system transforms as virtual columns: df.geo accessor.

Counterpart of /root/reference/packages/vaex-core/vaex/geo.py:1-574: every
transform adds expression virtual columns (compiled into the TPU pass like
any expression); uncertainty propagation uses the symbolic Jacobian
(expresso.derivative via df.propagate_uncertainties)."""

from __future__ import annotations

import math

import numpy as np

from .dataframe import register_dataframe_accessor


def _s(e):
    from .expression import Expression
    return e.expression if isinstance(e, Expression) else str(e)


@register_dataframe_accessor("geo")
class DataFrameAccessorGeo:
    """Reference: vaex/geo.py DataFrameAccessorGeo."""

    def __init__(self, df):
        self.df = df

    def spherical2cartesian(self, alpha, delta, distance, xname="x", yname="y", zname="z",
                            propagate_uncertainties=False, center=(0, 0, 0), radians=False, inplace=False):
        """Reference: geo.py add_virtual_columns_spherical_to_cartesian."""
        df = self.df if inplace else self.df.copy()
        alpha, delta, distance = _s(alpha), _s(delta), _s(distance)
        if not radians:
            alpha = f"deg2rad({alpha})"
            delta = f"deg2rad({delta})"
        df.add_virtual_column(xname, f"cos({alpha}) * cos({delta}) * ({distance}) + {center[0]}")
        df.add_virtual_column(yname, f"sin({alpha}) * cos({delta}) * ({distance}) + {center[1]}")
        df.add_virtual_column(zname, f"sin({delta}) * ({distance}) + {center[2]}")
        if propagate_uncertainties:
            df.propagate_uncertainties([df[xname], df[yname], df[zname]])
        return df

    def cartesian2spherical(self, x="x", y="y", z="z", alpha="l", delta="b", distance="distance",
                            radians=False, center=(0, 0, 0), inplace=False):
        """Reference: geo.py add_virtual_columns_cartesian_to_spherical."""
        df = self.df if inplace else self.df.copy()
        x, y, z = _s(x), _s(y), _s(z)
        if center != (0, 0, 0):
            x = f"(({x}) - {center[0]})"
            y = f"(({y}) - {center[1]})"
            z = f"(({z}) - {center[2]})"
        transform = "" if radians else "rad2deg"
        df.add_virtual_column(distance, f"sqrt(({x})**2 + ({y})**2 + ({z})**2)")
        df.add_virtual_column(alpha, f"{transform}(arctan2({y}, {x}))")
        df.add_virtual_column(delta, f"{transform}(arcsin(({z}) / {distance}))")
        return df

    def cartesian2polar(self, x="x", y="y", radius_out="r_polar", azimuth_out="phi_polar",
                        radians=False, inplace=False):
        df = self.df if inplace else self.df.copy()
        x, y = _s(x), _s(y)
        transform = "" if radians else "rad2deg"
        df.add_virtual_column(radius_out, f"sqrt(({x})**2 + ({y})**2)")
        df.add_virtual_column(azimuth_out, f"{transform}(arctan2({y}, {x}))")
        return df

    def polar2cartesian(self, radius="r_polar", azimuth="phi_polar", x_out="x", y_out="y",
                        radians=False, inplace=False):
        df = self.df if inplace else self.df.copy()
        radius, azimuth = _s(radius), _s(azimuth)
        if not radians:
            azimuth = f"deg2rad({azimuth})"
        df.add_virtual_column(x_out, f"({radius}) * cos({azimuth})")
        df.add_virtual_column(y_out, f"({radius}) * sin({azimuth})")
        return df

    def velocity_polar2cartesian(self, x="x", y="y", azimuth=None, vr="vr_polar", vazimuth="vphi_polar",
                                 vx_out="vx", vy_out="vy", propagate_uncertainties=False, inplace=False):
        df = self.df if inplace else self.df.copy()
        x, y = _s(x), _s(y)
        if azimuth is None:
            azimuth = f"arctan2({y}, {x})"
        else:
            azimuth = f"deg2rad({_s(azimuth)})"
        df.add_virtual_column(vx_out, f"({_s(vr)}) * cos({azimuth}) - ({_s(vazimuth)}) * sin({azimuth})")
        df.add_virtual_column(vy_out, f"({_s(vr)}) * sin({azimuth}) + ({_s(vazimuth)}) * cos({azimuth})")
        return df

    def velocity_cartesian2polar(self, x="x", y="y", vx="vx", vy="vy", vr_out="vr_polar",
                                 vazimuth_out="vphi_polar", propagate_uncertainties=False, inplace=False):
        df = self.df if inplace else self.df.copy()
        x, y, vx, vy = _s(x), _s(y), _s(vx), _s(vy)
        r = f"sqrt(({x})**2 + ({y})**2)"
        df.add_virtual_column(vr_out, f"(({x}) * ({vx}) + ({y}) * ({vy})) / ({r})")
        df.add_virtual_column(vazimuth_out, f"(({x}) * ({vy}) - ({y}) * ({vx})) / ({r})")
        return df

    def velocity_cartesian2spherical(self, x="x", y="y", z="z", vx="vx", vy="vy", vz="vz",
                                     vr="vr", vlong="vlong", vlat="vlat", distance=None, inplace=False):
        """Reference: geo.py add_virtual_columns_cartesian_velocities_to_spherical."""
        df = self.df if inplace else self.df.copy()
        x, y, z, vx, vy, vz = map(_s, (x, y, z, vx, vy, vz))
        if distance is None:
            distance = f"sqrt(({x})**2 + ({y})**2 + ({z})**2)"
        rho = f"sqrt(({x})**2 + ({y})**2)"
        df.add_virtual_column(vr, f"(({x}) * ({vx}) + ({y}) * ({vy}) + ({z}) * ({vz})) / ({distance})")
        df.add_virtual_column(vlong, f"((-({y}) * ({vx}) + ({x}) * ({vy})) / ({rho}))")
        df.add_virtual_column(vlat, f"(-({z}) * (({x}) * ({vx}) + ({y}) * ({vy})) / ({rho}) + ({rho}) * ({vz})) / ({distance})")
        return df

    def rotation_2d(self, x, y, xnew, ynew, angle_degrees, inplace=False):
        """Reference: geo.py add_virtual_columns_rotation."""
        df = self.df if inplace else self.df.copy()
        x, y = _s(x), _s(y)
        theta = math.radians(angle_degrees)
        c, s = math.cos(theta), math.sin(theta)
        df.add_virtual_column(xnew, f"({x}) * {c!r} - ({y}) * {s!r}")
        df.add_virtual_column(ynew, f"({x}) * {s!r} + ({y}) * {c!r}")
        return df

    def project_aitoff(self, alpha, delta, x, y, radians=True, inplace=False):
        """Aitoff projection (reference: geo.py add_virtual_columns_aitoff)."""
        df = self.df if inplace else self.df.copy()
        alpha, delta = _s(alpha), _s(delta)
        if not radians:
            alpha = f"deg2rad({alpha})"
            delta = f"deg2rad({delta})"
        aitoff_alpha = f"__aitoff_alpha_{x}"
        df.add_virtual_column(aitoff_alpha, f"arccos(cos({delta}) * cos(({alpha}) / 2))")
        df.add_virtual_column(x, f"2 * cos({delta}) * sin(({alpha}) / 2) / sinc({aitoff_alpha} / pi) / pi")
        df.add_virtual_column(y, f"sin({delta}) / sinc({aitoff_alpha} / pi) / pi")
        return df

    def project_gnomic(self, alpha, delta, alpha0=0, delta0=0, x="x", y="y", radians=False, postfix="", inplace=False):
        """Gnomic projection (reference: geo.py add_virtual_columns_projection_gnomic)."""
        df = self.df if inplace else self.df.copy()
        alpha, delta = _s(alpha), _s(delta)
        if not radians:
            alpha = f"deg2rad({alpha})"
            delta = f"deg2rad({delta})"
            alpha0 = math.radians(alpha0)
            delta0 = math.radians(delta0)
        transform = "" if radians else "rad2deg"
        denom = (f"(cos({delta0!r}) * cos({delta}) * cos(({alpha}) - {alpha0!r}) + "
                 f"sin({delta0!r}) * sin({delta}))")
        df.add_virtual_column(x + postfix, f"{transform}(cos({delta}) * sin(({alpha}) - {alpha0!r}) / {denom})")
        df.add_virtual_column(y + postfix, f"{transform}((cos({delta0!r}) * sin({delta}) - sin({delta0!r}) * cos({delta}) * cos(({alpha}) - {alpha0!r})) / {denom})")
        return df

    def bearing(self, lon1, lat1, lon2, lat2, bearing="bearing", inplace=False):
        """Great-circle bearing (reference: geo.py bearing)."""
        df = self.df if inplace else self.df.copy()
        lon1, lat1, lon2, lat2 = map(_s, (lon1, lat1, lon2, lat2))
        l1 = f"deg2rad({lat1})"
        l2 = f"deg2rad({lat2})"
        dl = f"(deg2rad({lon2}) - deg2rad({lon1}))"
        df.add_virtual_column(bearing, f"rad2deg(arctan2(sin({dl}) * cos({l2}), "
                                       f"cos({l1}) * sin({l2}) - sin({l1}) * cos({l2}) * cos({dl})))")
        return df

    def inside_polygon(self, x, y, px, py):
        """Boolean expression: points inside one polygon (reference:
        vaex.geo pnpoly / SelectionLasso)."""
        df = self.df
        vx = df.add_variable("poly_x_", np.asarray(px, dtype=np.float64), unique=True)
        vy = df.add_variable("poly_y_", np.asarray(py, dtype=np.float64), unique=True)
        return df[f"_lasso({_s(x)}, {_s(y)}, {vx}, {vy})"]

    def inside_which_polygon(self, x, y, pxs, pys):
        """Index of the first polygon containing each point (or missing)."""
        df = self.df
        expr = "-1"
        for i in reversed(range(len(pxs))):
            inside = self.inside_polygon(x, y, pxs[i], pys[i])
            expr = f"where({inside.expression}, {i}, {expr})"
        return df[expr]
