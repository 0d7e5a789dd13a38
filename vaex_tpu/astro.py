"""Astronomy IO + celestial transforms: FITS tables and the df.astro accessor.

Counterpart of /root/reference/packages/vaex-astro (SURVEY.md §2.4: FITS/
VOTable IO via astropy, celestial coordinate transforms as virtual columns,
astro/transformations.py).  astropy is not in this environment, so FITS
BINTABLE reading/writing is implemented directly on the FITS spec (2880-byte
header units, big-endian column data — numpy handles >-endian dtypes
zero-copy over the mmap); transforms are expression virtual columns like the
reference's.
"""

from __future__ import annotations

import math
import mmap as _mmap

import numpy as np

from .dataframe import register_dataframe_accessor
from .dataset import DatasetFile, register, register_opener

_TFORM_DTYPES = {
    "L": ">i1",  # logical (T/F bytes; exposed as bool)
    "B": ">u1",
    "I": ">i2",
    "J": ">i4",
    "K": ">i8",
    "E": ">f4",
    "D": ">f8",
}


def _parse_header(raw: bytes):
    cards = {}
    end = False
    for i in range(0, len(raw), 80):
        card = raw[i:i + 80].decode("ascii", errors="replace")
        key = card[:8].strip()
        if key == "END":
            end = True
            break
        if "=" not in card:
            continue
        value = card[10:].split("/")[0].strip()
        if value.startswith("'"):
            value = value.strip("'").strip()
        cards[key] = value
    return cards, end


def _read_header(fileobj):
    """Read one FITS header (multiple of 2880 bytes) → dict of cards."""
    cards = {}
    while True:
        block = fileobj.read(2880)
        if len(block) < 2880:
            return None
        block_cards, end = _parse_header(block)
        cards.update(block_cards)
        if end:
            return cards


@register
class FitsDataset(DatasetFile):
    """FITS BINTABLE reader, zero-copy over mmap (reference:
    vaex-astro/vaex/astro/fits.py FitsBinTable)."""

    snake_name = "fits"

    def __init__(self, path, fs_options=None):
        super().__init__(path, fs_options)
        self._load()

    def _load(self):
        self._file = open(self.path, "rb")
        self._mmap = _mmap.mmap(self._file.fileno(), 0, access=_mmap.ACCESS_READ)
        f = self._file
        f.seek(0)
        columns = {}
        row_count = 0
        # primary HDU
        header = _read_header(f)
        if header is None or header.get("SIMPLE", "F") not in ("T", "T "):
            raise IOError(f"{self.path} is not a FITS file")
        self._skip_data(f, header)
        # extensions
        while True:
            header = _read_header(f)
            if header is None:
                break
            data_start = f.tell()
            if header.get("XTENSION", "").startswith("BINTABLE"):
                naxis1 = int(header["NAXIS1"])  # bytes per row
                naxis2 = int(header["NAXIS2"])  # rows
                tfields = int(header["TFIELDS"])
                offset = 0
                for i in range(1, tfields + 1):
                    name = header.get(f"TTYPE{i}", f"col{i}")
                    tform = header[f"TFORM{i}"].strip()
                    repeat = int(tform[:-1]) if tform[:-1] else 1
                    code = tform[-1]
                    if code == "A":
                        width = repeat
                        columns[name] = _strided(self._mmap, data_start + offset, naxis1, naxis2,
                                                 np.dtype(f"S{width}"))
                        offset += width
                        continue
                    if code not in _TFORM_DTYPES:
                        offset += repeat * _tform_size(code)
                        continue
                    dtype = np.dtype(_TFORM_DTYPES[code])
                    if repeat != 1:
                        offset += repeat * dtype.itemsize
                        continue  # array columns unsupported (reference maps them to multiple columns)
                    ar = _strided(self._mmap, data_start + offset, naxis1, naxis2, dtype)
                    if code == "L":
                        ar = (ar == ord("T"))
                    columns[name] = ar
                    offset += dtype.itemsize
                row_count = naxis2
                break  # first table
            self._skip_data(f, header)
        self._columns = columns
        self._row_count = row_count

    @staticmethod
    def _skip_data(f, header):
        naxis = int(header.get("NAXIS", 0))
        if naxis == 0:
            return
        size = abs(int(header.get("BITPIX", 8))) // 8
        for i in range(1, naxis + 1):
            size *= int(header.get(f"NAXIS{i}", 0))
        blocks = (size + 2879) // 2880
        f.seek(blocks * 2880, 1)

    @classmethod
    def can_open(cls, path, **kwargs):
        return str(path).endswith((".fits", ".fit"))

    @classmethod
    def open(cls, path, fs_options=None, **kwargs):
        return cls(path, fs_options=fs_options)


def _strided(buf, offset, stride, count, dtype):
    """Column view over row-major FITS table data: big-endian strided reads.
    numpy strided views over the mmap keep this zero-copy."""
    raw = np.frombuffer(buf, dtype=np.uint8, count=stride * count, offset=offset)
    return np.lib.stride_tricks.as_strided(raw[:dtype.itemsize].view(dtype),
                                           shape=(count,), strides=(stride,))


def _tform_size(code):
    return {"X": 1, "C": 8, "M": 16, "P": 8, "Q": 16, "A": 1}.get(code, 8)


register_opener(FitsDataset)


def export_fits(df, path):
    """Write a single-BINTABLE FITS file (reference: vaex-astro export)."""
    names = [n for n in df.get_column_names() if not df.data_type(n).is_string]
    arrays = {}
    tforms = {}
    np_to_tform = {"i1": "B", "u1": "B", "i2": "I", "i4": "J", "i8": "K", "f4": "E", "f8": "D", "b1": "L"}
    for name in names:
        ar = np.asarray(df.evaluate(name))
        if np.ma.isMaskedArray(ar):
            ar = ar.filled(0)
        if ar.dtype.kind in "Mm":
            ar = ar.view(np.int64)
        key = ar.dtype.str[1:]
        if key not in np_to_tform:
            continue
        code = np_to_tform[key]
        if code == "L":
            ar = np.where(ar, ord("T"), ord("F")).astype(np.uint8)
            arrays[name] = ar.astype(">u1")
            tforms[name] = "L"
        else:
            arrays[name] = ar.astype(">" + key)
            tforms[name] = code
    n = len(df)
    row_bytes = sum(a.dtype.itemsize for a in arrays.values())

    def card(key, value, comment=""):
        if isinstance(value, str):
            v = f"'{value:<8}'"
        elif isinstance(value, bool):
            v = "T" if value else "F"
        else:
            v = str(value)
        return f"{key:<8}= {v:>20} / {comment}"[:80].ljust(80).encode("ascii")

    def pad_header(cards):
        raw = b"".join(cards) + b"END" + b" " * 77
        return raw + b" " * ((2880 - len(raw) % 2880) % 2880)

    with open(path, "wb") as f:
        f.write(pad_header([card("SIMPLE", True), card("BITPIX", 8), card("NAXIS", 0),
                            card("EXTEND", True)]))
        cards = [card("XTENSION", "BINTABLE"), card("BITPIX", 8), card("NAXIS", 2),
                 card("NAXIS1", row_bytes), card("NAXIS2", n), card("PCOUNT", 0),
                 card("GCOUNT", 1), card("TFIELDS", len(arrays))]
        for i, name in enumerate(arrays, 1):
            cards.append(card(f"TTYPE{i}", name))
            cards.append(card(f"TFORM{i}", tforms[name]))
        f.write(pad_header(cards))
        table = np.empty(n, dtype=[(name, a.dtype) for name, a in arrays.items()])
        for name, a in arrays.items():
            table[name] = a
        data = table.tobytes()
        f.write(data)
        f.write(b"\x00" * ((2880 - len(data) % 2880) % 2880))


# galactic pole in ICRS (J2000) — standard constants
_GAL_POLE_RA = 192.85948
_GAL_POLE_DEC = 27.12825
_GAL_L_NCP = 122.93192  # galactic longitude of the celestial north pole


@register_dataframe_accessor("astro")
class DataFrameAccessorAstro:
    """Celestial transforms as virtual columns (reference:
    vaex-astro/vaex/astro/transformations.py)."""

    def __init__(self, df):
        self.df = df

    def eq2gal(self, alpha="ra", delta="dec", l="l", b="b", radians=False, inplace=False):
        """Equatorial (ICRS) → galactic coordinates."""
        df = self.df if inplace else self.df.copy()
        a, d = str(alpha), str(delta)
        if not radians:
            a, d = f"deg2rad({a})", f"deg2rad({d})"
        ap = math.radians(_GAL_POLE_RA)
        dp = math.radians(_GAL_POLE_DEC)
        lo = math.radians(_GAL_L_NCP)
        transform = "rad2deg" if not radians else ""
        sin_b = (f"(sin({d}) * {math.sin(dp)!r} + cos({d}) * {math.cos(dp)!r} * cos(({a}) - {ap!r}))")
        df.add_virtual_column(b, f"{transform}(arcsin({sin_b}))")
        y = f"(cos({d}) * sin(({a}) - {ap!r}))"
        x = f"(sin({d}) * {math.cos(dp)!r} - cos({d}) * {math.sin(dp)!r} * cos(({a}) - {ap!r}))"
        df.add_virtual_column(l, f"{transform}({lo!r} - arctan2({y}, {x})) % 360")
        return df

    def add_virtual_columns_proper_motion_eq2gal(self, alpha="ra", delta="dec", pm_a="pm_ra",
                                                 pm_d="pm_dec", pm_l="pm_l", pm_b="pm_b", radians=False, inplace=False):
        """Proper-motion rotation eq→gal (reference: transformations.py)."""
        df = self.df if inplace else self.df.copy()
        a, d = str(alpha), str(delta)
        if not radians:
            a, d = f"deg2rad({a})", f"deg2rad({d})"
        ap = math.radians(_GAL_POLE_RA)
        dp = math.radians(_GAL_POLE_DEC)
        c1 = f"({math.sin(dp)!r} * cos({d}) - {math.cos(dp)!r} * sin({d}) * cos(({a}) - {ap!r}))"
        c2 = f"({math.cos(dp)!r} * sin(({a}) - {ap!r}))"
        norm = f"sqrt({c1}**2 + {c2}**2)"
        df.add_virtual_column(pm_l, f"({c1} * ({pm_a}) + {c2} * ({pm_d})) / {norm}")
        df.add_virtual_column(pm_b, f"(-{c2} * ({pm_a}) + {c1} * ({pm_d})) / {norm}")
        return df

    def parallax_to_distance(self, parallax="parallax", distance="distance", parallax_uncertainty=None, inplace=False):
        df = self.df if inplace else self.df.copy()
        df.add_virtual_column(distance, f"1.0 / ({parallax})")
        return df


# ---------------------------------------------------------------------------
# VOTable IO (reference: vaex-astro votable support via astropy; here a
# self-contained TABLEDATA reader/writer, no astropy in this environment)
# ---------------------------------------------------------------------------

_VOT_DTYPES = {
    "double": np.float64, "float": np.float32,
    "long": np.int64, "int": np.int32, "short": np.int16,
    "unsignedByte": np.uint8, "boolean": np.bool_, "bit": np.bool_,
}
_VOT_NAMES = {
    np.dtype(np.float64): "double", np.dtype(np.float32): "float",
    np.dtype(np.int64): "long", np.dtype(np.int32): "int",
    np.dtype(np.int16): "short", np.dtype(np.uint8): "unsignedByte",
    np.dtype(np.bool_): "boolean",
}


def _vot_local(tag):
    return tag.rsplit("}", 1)[-1]


def read_votable(path):
    """Parse the first TABLE of a VOTable file → dict of arrays."""
    import xml.etree.ElementTree as ET
    tree = ET.parse(path)
    fields = []
    rows = []
    for elem in tree.iter():
        name = _vot_local(elem.tag)
        if name == "FIELD":
            fields.append((elem.get("name"), elem.get("datatype", "char"),
                           elem.get("arraysize")))
        elif name == "TR":
            rows.append([td.text if td.text is not None else ""
                         for td in elem if _vot_local(td.tag) == "TD"])
    columns = {}
    for i, (fname, datatype, arraysize) in enumerate(fields):
        raw = [r[i] if i < len(r) else "" for r in rows]
        if datatype in ("char", "unicodeChar"):
            import pyarrow as pa
            columns[fname] = pa.array(raw, type=pa.string())
            continue
        dt = _VOT_DTYPES.get(datatype, np.float64)
        out = np.empty(len(raw), dtype=dt)
        mask = np.zeros(len(raw), dtype=bool)
        for j, txt in enumerate(raw):
            txt = txt.strip()
            if not txt or txt.lower() == "nan":
                mask[j] = True
                out[j] = 0
            elif dt == np.bool_:
                out[j] = txt.strip().lower() in ("1", "t", "true")
            else:
                out[j] = dt(float(txt) if np.dtype(dt).kind == "f" else int(txt))
        if mask.any():
            if np.dtype(dt).kind == "f":
                out[mask] = np.nan
                columns[fname] = out
            else:
                columns[fname] = np.ma.MaskedArray(out, mask=mask)
        else:
            columns[fname] = out
    return columns


class VOTableDataset(DatasetFile):
    """Eager VOTable reader (VOTables are catalog-sized, not out-of-core)."""

    snake_name = "votable"

    def __init__(self, path, fs_options=None):
        super().__init__(path)
        self._columns = read_votable(path)
        lengths = {len(v) for v in self._columns.values()}
        self._row_count = lengths.pop() if lengths else 0

    @classmethod
    def can_open(cls, path, **kwargs):
        return str(path).endswith((".vot", ".votable"))

    @classmethod
    def open(cls, path, fs_options=None, **kwargs):
        return cls(path, fs_options=fs_options)


register_opener(VOTableDataset)


def export_votable(df, path, table_name="vaex_tpu"):
    """Write a VOTable 1.4 TABLEDATA file."""
    from xml.sax.saxutils import escape
    names = df.get_column_names()
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<VOTABLE version="1.4" xmlns="http://www.ivoa.net/xml/VOTable/v1.3">',
             ' <RESOURCE>', f'  <TABLE name="{escape(table_name)}">']
    arrays = {}
    for name in names:
        dtype = df.data_type(name)
        values = df.evaluate(name)
        stringy = dtype.is_string or (
            isinstance(values, np.ndarray) and values.dtype.kind in "OUS")
        if stringy:
            lines.append(f'   <FIELD name="{escape(name)}" datatype="char" arraysize="*"/>')
            arrays[name] = values.to_pylist() if hasattr(values, "to_pylist") else list(values)
        else:
            npdt = np.dtype(str(dtype)) if not dtype.is_temporal else np.dtype(np.int64)
            votype = _VOT_NAMES.get(npdt, "double")
            lines.append(f'   <FIELD name="{escape(name)}" datatype="{votype}"/>')
            arrays[name] = values if np.ma.isMaskedArray(values) else np.asarray(values)
    lines += ['   <DATA>', '    <TABLEDATA>']
    n = len(df)
    for i in range(n):
        tds = []
        for name in names:
            col = arrays[name]
            v = col[i]
            if isinstance(col, np.ma.MaskedArray) and np.ma.getmaskarray(col)[i]:
                tds.append("<TD></TD>")
            elif isinstance(v, float) and np.isnan(v) or (isinstance(v, np.floating) and np.isnan(v)):
                tds.append("<TD></TD>")
            elif v is None:
                tds.append("<TD></TD>")
            elif isinstance(v, (bool, np.bool_)):
                tds.append(f"<TD>{'true' if v else 'false'}</TD>")
            elif isinstance(v, str):
                tds.append(f"<TD>{escape(v)}</TD>")
            else:
                tds.append(f"<TD>{v}</TD>")
        lines.append("     <TR>" + "".join(tds) + "</TR>")
    lines += ['    </TABLEDATA>', '   </DATA>', '  </TABLE>', ' </RESOURCE>', '</VOTABLE>', '']
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))


# ---------------------------------------------------------------------------
# TAP (Table Access Protocol) remote queries
# (reference: vaex-astro/vaex/astro tap support — astropy TAP; here a
# self-contained sync-TAP client over urllib + the VOTable reader above)
# ---------------------------------------------------------------------------

def from_tap(url, query, maxrec=None, timeout=60):
    """Run an ADQL query against a TAP service's synchronous endpoint and
    return a DataFrame (e.g. url="https://gea.esac.esa.int/tap-server/tap",
    query="SELECT TOP 10 ra, dec FROM gaiadr3.gaia_source").

    Sync TAP is a plain HTTP POST returning a VOTable — parsed by the
    engine's own reader, no astropy needed."""
    import io
    import tempfile
    import urllib.parse
    import urllib.request

    params = {
        "REQUEST": "doQuery",
        "LANG": "ADQL",
        "FORMAT": "votable",
        "QUERY": query,
    }
    if maxrec is not None:
        params["MAXREC"] = str(int(maxrec))
    endpoint = url.rstrip("/") + "/sync"
    data = urllib.parse.urlencode(params).encode()
    req = urllib.request.Request(endpoint, data=data, headers={
        "User-Agent": "vaex_tpu", "Accept": "application/x-votable+xml"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = resp.read()
    with tempfile.NamedTemporaryFile(suffix=".vot", delete=False) as f:
        f.write(body)
        path = f.name
    columns = read_votable(path)
    from . import from_arrays
    return from_arrays(**columns)
