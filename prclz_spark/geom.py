"""Pure-numpy geometry core: types, WKB/WKT codecs, measures, predicates.

From-scratch replacement for the shapely object model used throughout the
reference (`prclz/topology.py`, `prclz/_complexity.py`, `prclz/_parcels.py`):
no GEOS available in this environment, so every primitive is implemented on
numpy float64 arrays. Geometry travels through Spark as WKB ``BinaryType``
columns; these codecs are the only (de)serialization boundary, invoked inside
Arrow-batched pandas UDFs (never per-row Python at the DataFrame level).

Representation
--------------
A geometry is a ``Geom(kind, data)`` where ``kind`` is the WKB geometry type
id and ``data`` is:

========  =================  =======================================
kind      name               data
========  =================  =======================================
1         Point              ``(2,)`` float64 array
2         LineString         ``(n,2)`` float64 array
3         Polygon            list of ``(n,2)`` rings (first = outer,
                             closed: last vertex == first)
4         MultiPoint         ``(n,2)`` float64 array
5         MultiLineString    list of ``(n,2)`` arrays
6         MultiPolygon       list of polygon ring-lists
========  =================  =======================================

WKB subset: little-endian, 2-D, geometry types 1-7 (GeometryCollection is
parsed but rarely produced).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

try:  # optional C inner loops (see kernels/planar_fast.c); pure-numpy fallback
    from .kernels import planar_fast as _PF
except Exception:  # pragma: no cover - missing/incompatible build
    _PF = None
if _PF is not None and not hasattr(_PF, "pip_ray"):  # stale .so
    _PF = None

POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 1, 2, 3, 4, 5, 6

_KIND_NAMES = {
    1: "POINT",
    2: "LINESTRING",
    3: "POLYGON",
    4: "MULTIPOINT",
    5: "MULTILINESTRING",
    6: "MULTIPOLYGON",
}
_NAME_KINDS = {v: k for k, v in _KIND_NAMES.items()}


@dataclass(slots=True)
class Geom:
    kind: int
    data: object

    @property
    def type_name(self) -> str:
        return _KIND_NAMES[self.kind]

    def __eq__(self, other) -> bool:  # structural equality (exact floats)
        if not isinstance(other, Geom) or self.kind != other.kind:
            return False
        a, b = self.data, other.data
        if isinstance(a, np.ndarray):
            return isinstance(b, np.ndarray) and a.shape == b.shape and bool(np.array_equal(a, b))
        if len(a) != len(b):
            return False
        for pa, pb in zip(a, b):
            if isinstance(pa, np.ndarray):
                if not np.array_equal(pa, pb):
                    return False
            else:
                if len(pa) != len(pb) or any(not np.array_equal(ra, rb) for ra, rb in zip(pa, pb)):
                    return False
        return True


def point(x: float, y: float) -> Geom:
    return Geom(POINT, np.array([x, y], dtype=np.float64))


def linestring(coords) -> Geom:
    return Geom(LINESTRING, np.asarray(coords, dtype=np.float64).reshape(-1, 2))


def _close_ring(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring


def polygon(shell, holes=()) -> Geom:
    rings = [_close_ring(shell)] + [_close_ring(h) for h in holes]
    return Geom(POLYGON, rings)


def multipoint(coords) -> Geom:
    return Geom(MULTIPOINT, np.asarray(coords, dtype=np.float64).reshape(-1, 2))


def multilinestring(lines) -> Geom:
    return Geom(MULTILINESTRING, [np.asarray(l, dtype=np.float64).reshape(-1, 2) for l in lines])


def multipolygon(polys) -> Geom:
    """polys: list of ring-lists or list of Polygon Geoms."""
    out = []
    for p in polys:
        if isinstance(p, Geom):
            out.append(p.data)
        else:
            out.append([_close_ring(r) for r in p])
    return Geom(MULTIPOLYGON, out)


def box(xmin: float, ymin: float, xmax: float, ymax: float) -> Geom:
    return polygon([(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)])


# ---------------------------------------------------------------------------
# WKB codec (little-endian 2-D subset)
# ---------------------------------------------------------------------------

def _wkb_coords(arr: np.ndarray) -> bytes:
    return struct.pack("<I", len(arr)) + np.ascontiguousarray(arr, dtype="<f8").tobytes()


def wkb_dumps(g: Geom) -> bytes:
    k = g.kind
    head = struct.pack("<BI", 1, k)
    if k == POINT:
        return head + np.asarray(g.data, dtype="<f8").tobytes()
    if k in (LINESTRING, MULTIPOINT):
        if k == MULTIPOINT:  # stored flat; WKB nests points
            pts = g.data
            body = struct.pack("<I", len(pts)) + b"".join(
                struct.pack("<BI", 1, POINT) + np.asarray(p, dtype="<f8").tobytes() for p in pts
            )
            return head + body
        return head + _wkb_coords(g.data)
    if k == POLYGON:
        return head + struct.pack("<I", len(g.data)) + b"".join(_wkb_coords(r) for r in g.data)
    if k == MULTILINESTRING:
        return head + struct.pack("<I", len(g.data)) + b"".join(
            struct.pack("<BI", 1, LINESTRING) + _wkb_coords(l) for l in g.data
        )
    if k == MULTIPOLYGON:
        parts = []
        for rings in g.data:
            parts.append(
                struct.pack("<BII", 1, POLYGON, len(rings)) + b"".join(_wkb_coords(r) for r in rings)
            )
        return head + struct.pack("<I", len(g.data)) + b"".join(parts)
    raise ValueError(f"unsupported kind {k}")


def _read_coords(buf: memoryview, off: int):
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2).copy()
    return arr, off + 16 * n


def _wkb_load(buf: memoryview, off: int):
    byte_order, k = struct.unpack_from("<BI", buf, off)
    assert byte_order == 1, "big-endian WKB not supported"
    k &= 0xFF  # strip any SRID/dimension flag bits
    off += 5
    if k == POINT:
        arr = np.frombuffer(buf, dtype="<f8", count=2, offset=off).copy()
        return Geom(POINT, arr), off + 16
    if k == LINESTRING:
        arr, off = _read_coords(buf, off)
        return Geom(LINESTRING, arr), off
    if k == POLYGON:
        (nr,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            r, off = _read_coords(buf, off)
            rings.append(r)
        return Geom(POLYGON, rings), off
    if k in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, 7):
        (np_,) = struct.unpack_from("<I", buf, off)
        off += 4
        subs = []
        for _ in range(np_):
            sub, off = _wkb_load(buf, off)
            subs.append(sub)
        if k == MULTIPOINT:
            return Geom(MULTIPOINT, np.array([s.data for s in subs]).reshape(-1, 2)), off
        if k == MULTILINESTRING:
            return Geom(MULTILINESTRING, [s.data for s in subs]), off
        return Geom(MULTIPOLYGON, [s.data for s in subs]), off
    raise ValueError(f"unsupported WKB type {k}")


def wkb_loads(b: bytes) -> Geom:
    g, _ = _wkb_load(memoryview(b), 0)
    return g


# ---------------------------------------------------------------------------
# Batch WKB codec (VERDICT r3 #5): decode a whole Arrow batch with zero
# per-ring numpy dispatch. The header walk runs as a numpy WAVEFRONT (all
# geometries of a kind advance one ring per vectorized iteration; counts
# read as 4-gather u32s across the batch), then every coordinate double is
# fetched by 8 alignment-residue-class gathers over the concatenated
# buffer. Ring arrays are disjoint slices of that one gathered array (no
# per-ring copies; disjoint ranges, so in-place mutation of one ring can
# never alias another).
# ---------------------------------------------------------------------------

def _ranges_gather_idx(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized multi-range expansion: byte indices covering every
    [starts[k], starts[k]+lens[k]) range, concatenated in order."""
    tot = int(lens.sum())
    if tot == 0:
        return np.empty(0, dtype=np.int64)
    cum = np.cumsum(lens)
    return np.arange(tot, dtype=np.int64) + np.repeat(starts - (cum - lens), lens)


def wkb_loads_batch(bufs) -> list:
    """Decode a whole batch of WKB buffers; None passes through as None.
    Equivalent to [wkb_loads(b) for b in bufs] (exact floats) — pinned by
    tests/test_geom_batch.py.

    Fully vectorized: the header walk runs as a numpy WAVEFRONT — all
    geometries of a kind advance one ring per iteration (loop count = max
    rings per geometry, not total rings), with every count read as a
    4-gather u32 across the whole batch. Coordinate doubles are fetched by
    8 residue-class gathers over the concatenated buffer (unaligned <f8
    views), so no per-ring numpy dispatch anywhere. GeometryCollection,
    big-endian, flag bits and malformed buffers fall back to the scalar
    decoder element-wise (same exception semantics)."""
    bufs = list(bufs)
    out = [None] * len(bufs)
    # bytearray (Spark) and bytes both index/join fine — no copies here
    live = [(i, b) for i, b in enumerate(bufs) if b is not None]
    if not live:
        return out
    joined = b"".join(b for _, b in live)
    raw = np.frombuffer(joined, dtype=np.uint8)
    # homogeneous POINT column (the 10^9-row probe-side shape): every
    # buffer is the fixed 21-byte header+coords layout - one reshape.
    # Every INDIVIDUAL buffer must be 21 bytes (round-4 ADVICE: a mixed
    # batch whose lengths merely sum to 21n must not take the reshape — a
    # 16-byte invalid buffer was silently mis-decoded as a POINT where the
    # scalar decoder raises).
    if (
        len(joined) == 21 * len(live)
        and joined[1] == POINT
        and (
            np.fromiter((len(b) for _, b in live), np.int64, len(live)) == 21
        ).all()
    ):
        m = raw.reshape(-1, 21)
        if (m[:, 0] == 1).all() and (m[:, 1] == POINT).all() and not m[:, 2:5].any():
            pts = m[:, 5:].copy().view("<f8").reshape(-1, 2)
            for (i, _), p in zip(live, pts):
                out[i] = Geom(POINT, p)
            return out
    try:
        return _wkb_loads_batch_vec(out, live, joined, raw)
    except (IndexError, ValueError, struct.error):
        # wholesale scalar fallback: identical per-element semantics
        for i, b in live:
            out[i] = wkb_loads(bytes(b))
        return out


def _u32v(raw: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Vectorized little-endian u32 read at arbitrary byte positions."""
    return (
        raw[pos].astype(np.int64)
        | (raw[pos + 1].astype(np.int64) << 8)
        | (raw[pos + 2].astype(np.int64) << 16)
        | (raw[pos + 3].astype(np.int64) << 24)
    )


def _wkb_loads_batch_vec(out: list, live: list, joined: bytes, raw: np.ndarray) -> list:
    blens = np.fromiter((len(b) for _, b in live), count=len(live), dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(blens)[:-1]])
    n_live = len(live)
    ok = blens >= 5
    kinds = np.zeros(n_live, dtype=np.int64)
    kinds[ok] = raw[offs[ok] + 1]
    flags = np.zeros(n_live, dtype=np.int64)
    flags[ok] = raw[offs[ok] + 2] | raw[offs[ok] + 3] | raw[offs[ok] + 4]
    good = ok & (raw[offs.clip(0)] == 1) & (flags == 0) & (kinds >= POINT) & (kinds <= MULTIPOLYGON)
    for t in np.nonzero(~good)[0].tolist():
        out[live[t][0]] = wkb_loads(bytes(live[t][1]))  # scalar semantics (raises)

    # ring record arrays, one batch per wavefront step: (geom, seq, start, npts)
    R_g: list = []
    R_seq: list = []
    R_start: list = []
    R_n: list = []
    gidx = np.arange(n_live, dtype=np.int64)

    def rec(g, seq, start, n):
        R_g.append(g)
        R_seq.append(seq)
        R_start.append(start)
        R_n.append(n)

    def check_member_headers(pos: np.ndarray, kind: int) -> None:
        """Validate inner member headers of MULTI* kinds (round-4 ADVICE):
        the wavefront assumes canonical little-endian members of the
        expected kind with zero flag bytes at fixed offsets — anything else
        (corrupt bytes, big-endian member, SRID flags) raises here so the
        whole batch reruns through the scalar decoder, which is the
        semantic authority for such buffers. Out-of-range positions raise
        IndexError, routed to the same fallback."""
        if len(pos) and (
            (raw[pos] != 1)
            | (raw[pos + 1] != kind)
            | (raw[pos + 2] != 0)
            | (raw[pos + 3] != 0)
            | (raw[pos + 4] != 0)
        ).any():
            raise ValueError("non-canonical WKB member header in batch")

    m = good & (kinds == POINT)
    if m.any():
        g = gidx[m]
        rec(g, np.zeros(len(g), np.int64), offs[m] + 5, np.ones(len(g), np.int64))
    m = good & (kinds == LINESTRING)
    if m.any():
        g = gidx[m]
        rec(g, np.zeros(len(g), np.int64), offs[m] + 9, _u32v(raw, offs[m] + 5))
    m = good & (kinds == MULTIPOINT)
    if m.any():
        g = gidx[m]
        n = _u32v(raw, offs[m] + 5)
        tot = int(n.sum())
        if tot:
            within = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(n) - n, n)
            hdr_pos = np.repeat(offs[m] + 9, n) + 21 * within
            check_member_headers(hdr_pos, POINT)
            rec(
                np.repeat(g, n),
                within,
                hdr_pos + 5,
                np.ones(tot, np.int64),
            )
    m = good & (kinds == POLYGON)
    if m.any():
        g = gidx[m]
        q = offs[m] + 9
        rem = _u32v(raw, offs[m] + 5)
        seq = np.zeros(len(g), np.int64)
        while True:
            act = rem > 0
            if not act.all():
                g, q, rem, seq = g[act], q[act], rem[act], seq[act]
            if not len(g):
                break
            n = _u32v(raw, q)
            rec(g, seq.copy(), q + 4, n)
            q = q + 4 + 16 * n
            rem = rem - 1
            seq = seq + 1
    m = good & (kinds == MULTILINESTRING)
    if m.any():
        g = gidx[m]
        q = offs[m] + 9
        rem = _u32v(raw, offs[m] + 5)
        seq = np.zeros(len(g), np.int64)
        while True:
            act = rem > 0
            if not act.all():
                g, q, rem, seq = g[act], q[act], rem[act], seq[act]
            if not len(g):
                break
            check_member_headers(q, LINESTRING)
            n = _u32v(raw, q + 5)
            rec(g, seq.copy(), q + 9, n)
            q = q + 9 + 16 * n
            rem = rem - 1
            seq = seq + 1
    mp_counts: dict = {}
    m = good & (kinds == MULTIPOLYGON)
    if m.any():
        g = gidx[m]
        q = offs[m] + 5
        polys_rem = _u32v(raw, q)
        q = q + 4
        rings_rem = np.zeros(len(g), np.int64)
        seq = np.zeros(len(g), np.int64)
        for t in g:
            mp_counts[int(t)] = []
        while True:
            act = (polys_rem > 0) | (rings_rem > 0)
            if not act.all():
                g, q, polys_rem, rings_rem, seq = (
                    g[act], q[act], polys_rem[act], rings_rem[act], seq[act]
                )
            if not len(g):
                break
            hdr = rings_rem == 0  # next token is a polygon header
            if hdr.any():
                check_member_headers(q[hdr], POLYGON)
                nr = _u32v(raw, q[hdr] + 5)
                for t, c in zip(g[hdr], nr):
                    mp_counts[int(t)].append(int(c))
                q[hdr] += 9
                rings_rem[hdr] = nr
                polys_rem[hdr] -= 1
            rng = ~hdr
            if rng.any():
                n = _u32v(raw, q[rng])
                rec(g[rng], seq[rng].copy(), q[rng] + 4, n)
                q[rng] += 4 + 16 * n
                rings_rem[rng] -= 1
                seq[rng] += 1

    if R_g:
        g_all = np.concatenate(R_g)
        seq_all = np.concatenate(R_seq)
        order = np.lexsort((seq_all, g_all))
        g_all = g_all[order]
        starts = np.concatenate(R_start)[order]
        npts = np.concatenate(R_n)[order]
    else:
        g_all = np.empty(0, np.int64)
        starts = np.empty(0, np.int64)
        npts = np.empty(0, np.int64)

    # bounds check BEFORE gathering: every ring must fit its own buffer
    ends_b = starts + 16 * npts
    lim = offs[g_all] + blens[g_all]
    if len(starts) and ((starts < 0).any() or (ends_b > lim).any()):
        raise ValueError("malformed WKB in batch")

    ends_np = np.cumsum(npts)
    begins_np = ends_np - npts
    coords = np.empty((int(ends_np[-1]) if len(npts) else 0, 2), dtype=np.float64)
    flat = coords.reshape(-1)
    # gather DOUBLES: within each (start mod 8) residue class the run is a
    # contiguous slice of an unaligned <f8 view of the joined buffer
    res = starts % 8
    ndbl = npts * 2
    for r in np.unique(res):
        cls = res == r
        view = np.frombuffer(
            joined, dtype="<f8", offset=int(r), count=(len(joined) - int(r)) // 8
        )
        src = _ranges_gather_idx((starts[cls] - r) // 8, ndbl[cls])
        dst = _ranges_gather_idx(begins_np[cls] * 2, ndbl[cls])
        flat[dst] = view[src]

    ring_count = np.bincount(g_all, minlength=n_live)
    first_ring = np.concatenate([[0], np.cumsum(ring_count)[:-1]])
    begins = begins_np.tolist()
    ends = ends_np.tolist()
    rc = ring_count.tolist()
    fr = first_ring.tolist()
    kl = kinds.tolist()
    for t in np.nonzero(good)[0].tolist():
        i = live[t][0]
        k = kl[t]
        r0 = fr[t]
        if k == POINT:
            out[i] = Geom(POINT, coords[begins[r0]])
        elif k == LINESTRING:
            out[i] = Geom(LINESTRING, coords[begins[r0]:ends[r0]])
        elif k == POLYGON:
            out[i] = Geom(
                POLYGON, [coords[begins[r0 + j]:ends[r0 + j]] for j in range(rc[t])]
            )
        elif k == MULTIPOINT:
            n = rc[t]
            # member points are consecutive 1-pt rings -> one flat slice
            out[i] = Geom(MULTIPOINT, coords[begins[r0]:begins[r0] + n] if n else coords[:0])
        elif k == MULTILINESTRING:
            out[i] = Geom(
                MULTILINESTRING, [coords[begins[r0 + j]:ends[r0 + j]] for j in range(rc[t])]
            )
        else:  # MULTIPOLYGON
            polys = []
            j = r0
            for nr in mp_counts.get(t, ()):
                polys.append([coords[begins[j + u]:ends[j + u]] for u in range(nr)])
                j += nr
            out[i] = Geom(MULTIPOLYGON, polys)
    return out


_PT_HDR = np.frombuffer(struct.pack("<BI", 1, POINT), dtype=np.uint8)


def wkb_dumps_points_batch(xy: np.ndarray) -> list:
    """Encode an (n, 2) coordinate array as n POINT WKBs in one numpy pass
    (21 bytes each: fixed header + doubles)."""
    xy = np.ascontiguousarray(xy, dtype="<f8")
    n = len(xy)
    if n == 0:
        return []
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, :5] = _PT_HDR
    buf[:, 5:] = xy.view(np.uint8).reshape(n, 16)
    flat = buf.tobytes()
    return [flat[i * 21:(i + 1) * 21] for i in range(n)]


def wkb_dumps_batch(geoms) -> list:
    """Encode a batch; None passes through. Byte-identical to
    [wkb_dumps(g) for g in geoms] (pinned by tests). All-point batches
    take the fused single-numpy-pass path (the shape the probe-side hot
    paths emit); mixed batches use the scalar encoder per element — a
    fully vectorized mixed-kind encoder was built and MEASURED SLOWER
    (0.43×: per-ring header bookkeeping in Python costs more than the
    scalar encoder's struct.pack + ndarray.tobytes, which are already
    C-speed), so the simple path stays."""
    geoms = list(geoms)
    live = [(i, g) for i, g in enumerate(geoms) if g is not None]
    out = [None] * len(geoms)
    if not live:
        return out
    if all(g.kind == POINT for _, g in live):
        enc = wkb_dumps_points_batch(np.stack([g.data for _, g in live]))
        for (i, _), e in zip(live, enc):
            out[i] = e
        return out
    for i, g in live:
        out[i] = wkb_dumps(g)
    return out


# ---------------------------------------------------------------------------
# WKT codec (fixture boundary format, `prclz/utils.py:45-61` convention)
# ---------------------------------------------------------------------------

def _fmt_xy(p) -> str:
    return f"{p[0]:.10g} {p[1]:.10g}"


def _fmt_seq(arr) -> str:
    return "(" + ", ".join(_fmt_xy(p) for p in arr) + ")"


def wkt_dumps(g: Geom) -> str:
    k = g.kind
    if k == POINT:
        return f"POINT ({_fmt_xy(g.data)})"
    if k == LINESTRING:
        return f"LINESTRING {_fmt_seq(g.data)}"
    if k == POLYGON:
        return "POLYGON (" + ", ".join(_fmt_seq(r) for r in g.data) + ")"
    if k == MULTIPOINT:
        return "MULTIPOINT (" + ", ".join(f"({_fmt_xy(p)})" for p in g.data) + ")"
    if k == MULTILINESTRING:
        return "MULTILINESTRING (" + ", ".join(_fmt_seq(l) for l in g.data) + ")"
    if k == MULTIPOLYGON:
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(_fmt_seq(r) for r in rings) + ")" for rings in g.data
        ) + ")"
    raise ValueError(f"unsupported kind {k}")


def _parse_nested(s: str):
    """Parse the parenthesized coord structure of a WKT body into nested lists."""
    s = s.strip()
    if not s.startswith("("):
        # bare coordinate pair(s)
        return [float(t) for t in s.replace(",", " ").split()]
    out, i = [], 1
    depth_start = None
    depth = 0
    buf_start = 1
    n = len(s)
    while i < n:
        c = s[i]
        if c == "(":
            if depth == 0:
                depth_start = i
            depth += 1
        elif c == ")":
            if depth == 0:
                # end of this level: trailing scalar chunk
                chunk = s[buf_start:i].strip(" ,")
                if chunk:
                    for part in chunk.split(","):
                        part = part.strip()
                        if part:
                            out.append([float(t) for t in part.split()])
                return out
            depth -= 1
            if depth == 0:
                out.append(_parse_nested(s[depth_start : i + 1]))
                buf_start = i + 1
        elif depth == 0 and c == ",":
            chunk = s[buf_start:i].strip(" ,")
            if chunk:
                out.append([float(t) for t in chunk.split()])
            buf_start = i + 1
        i += 1
    raise ValueError("unbalanced WKT parens")


def wkt_loads(s: str) -> Geom:
    s = s.strip()
    head = s.split("(", 1)[0].strip().upper().replace(" Z", "")
    if "EMPTY" in s.upper():
        kind = _NAME_KINDS[head]
        if kind in (POINT, LINESTRING, MULTIPOINT):
            return Geom(kind, np.zeros((0, 2)))
        return Geom(kind, [])
    body = s[s.index("(") :]
    nested = _parse_nested(body)
    if head == "POINT":
        return Geom(POINT, np.asarray(nested[0] if isinstance(nested[0], list) else nested, dtype=np.float64).reshape(2))
    if head == "LINESTRING":
        return Geom(LINESTRING, np.asarray(nested, dtype=np.float64).reshape(-1, 2))
    if head == "POLYGON":
        return Geom(POLYGON, [_close_ring(np.asarray(r, dtype=np.float64)) for r in nested])
    if head == "MULTIPOINT":
        pts = [p[0] if (isinstance(p, list) and isinstance(p[0], list)) else p for p in nested]
        return Geom(MULTIPOINT, np.asarray(pts, dtype=np.float64).reshape(-1, 2))
    if head == "MULTILINESTRING":
        return Geom(MULTILINESTRING, [np.asarray(l, dtype=np.float64).reshape(-1, 2) for l in nested])
    if head == "MULTIPOLYGON":
        return Geom(
            MULTIPOLYGON,
            [[_close_ring(np.asarray(r, dtype=np.float64)) for r in poly] for poly in nested],
        )
    raise ValueError(f"cannot parse WKT: {s[:60]}")


# ---------------------------------------------------------------------------
# Measures
# ---------------------------------------------------------------------------

def _ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (matches `prclz/topology.py:144-168`)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def area(g: Geom) -> float:
    if g.kind == POLYGON:
        return abs(_ring_area(g.data[0])) - sum(abs(_ring_area(r)) for r in g.data[1:])
    if g.kind == MULTIPOLYGON:
        return sum(area(Geom(POLYGON, rings)) for rings in g.data)
    return 0.0


def length(g: Geom) -> float:
    def _l(arr):
        d = np.diff(arr, axis=0)
        return float(np.sum(np.hypot(d[:, 0], d[:, 1])))

    if g.kind == LINESTRING:
        return _l(g.data)
    if g.kind == MULTILINESTRING:
        return sum(_l(l) for l in g.data)
    if g.kind == POLYGON:
        return sum(_l(r) for r in g.data)
    if g.kind == MULTIPOLYGON:
        return sum(sum(_l(r) for r in rings) for rings in g.data)
    return 0.0


def centroid(g: Geom) -> np.ndarray:
    """Area centroid for polygons (shoelace, `prclz/topology.py:150-168`),
    length-weighted for lines, mean for points."""
    if g.kind == POINT:
        return np.asarray(g.data, dtype=np.float64)
    if g.kind == MULTIPOINT:
        return g.data.mean(axis=0)
    if g.kind in (LINESTRING, MULTILINESTRING):
        lines = [g.data] if g.kind == LINESTRING else g.data
        tot_w, acc = 0.0, np.zeros(2)
        for arr in lines:
            d = np.diff(arr, axis=0)
            w = np.hypot(d[:, 0], d[:, 1])
            mid = 0.5 * (arr[:-1] + arr[1:])
            acc += (w[:, None] * mid).sum(axis=0)
            tot_w += w.sum()
        if tot_w == 0:
            return np.mean(np.vstack(lines), axis=0)
        return acc / tot_w
    if g.kind in (POLYGON, MULTIPOLYGON):
        polys = [g.data] if g.kind == POLYGON else g.data
        tot_a, acc = 0.0, np.zeros(2)
        for rings in polys:
            for i, r in enumerate(rings):
                x, y = r[:-1, 0], r[:-1, 1]
                x1, y1 = r[1:, 0], r[1:, 1]
                cross = x * y1 - x1 * y
                a = 0.5 * cross.sum()
                if a == 0:
                    continue
                cx = np.sum((x + x1) * cross) / (6 * a)
                cy = np.sum((y + y1) * cross) / (6 * a)
                sign = 1.0 if i == 0 else -1.0
                acc += sign * abs(a) * np.array([cx, cy])
                tot_a += sign * abs(a)
        if tot_a == 0:
            return np.mean(np.vstack([r for rings in polys for r in rings]), axis=0)
        return acc / tot_a
    raise ValueError(f"centroid of kind {g.kind}")


def bounds(g: Geom) -> tuple:
    arrs = _all_coords(g)
    allc = np.vstack(arrs)
    return (
        float(allc[:, 0].min()),
        float(allc[:, 1].min()),
        float(allc[:, 0].max()),
        float(allc[:, 1].max()),
    )


def _all_coords(g: Geom):
    k = g.kind
    if k == POINT:
        return [np.asarray(g.data).reshape(1, 2)]
    if k in (LINESTRING, MULTIPOINT):
        return [g.data]
    if k in (POLYGON, MULTILINESTRING):
        return list(g.data)
    if k == MULTIPOLYGON:
        return [r for rings in g.data for r in rings]
    return []


# ---------------------------------------------------------------------------
# Batch measures — one vectorized pass over a whole Arrow batch
# ---------------------------------------------------------------------------
# The per-geometry WKB decode is irreducible, but the coordinate math after
# decode is not: these helpers flatten every part/ring of a batch into ONE
# concatenated coordinate table and compute shoelace/centroid/length/bounds
# with reduceat + bincount segment reductions (the pattern proven hot-path
# in functions/st.st_centroid_xy_cell). Semantics match area()/centroid()/
# length()/bounds() exactly (same formulas, same degenerate fallbacks).


def _part_table(parts: list, owners: list):
    """parts: list of (ni,2) arrays; owners: geom index per part.
    → coords (N,2), starts (P+1,), owner (P,)."""
    coords = np.vstack(parts)
    lens = np.fromiter((len(p) for p in parts), dtype=np.int64, count=len(parts))
    starts = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)])
    return coords, starts, np.asarray(owners, dtype=np.int64), lens


def _polygon_batch(geoms: list, idxs: np.ndarray, m: int):
    """Vectorized area + centroid for the POLYGON/MULTIPOLYGON geoms at
    positions `idxs` of `geoms`; results land at those positions of the
    returned length-m arrays."""
    parts, owners, shell = [], [], []
    for i in idxs:
        g = geoms[i]
        polys = [g.data] if g.kind == POLYGON else g.data
        for rings in polys:
            for j, r in enumerate(rings):
                parts.append(np.asarray(r, dtype=np.float64))
                owners.append(i)
                shell.append(j == 0)
    areas = np.zeros(m)
    cents = np.full((m, 2), np.nan)
    if not parts:
        return areas, cents
    coords, starts, owner, lens = _part_table(parts, owners)
    n = len(coords)
    x, y = coords[:, 0], coords[:, 1]
    cross = np.zeros(n)
    cross[:-1] = x[:-1] * y[1:] - x[1:] * y[:-1]
    cxv = np.zeros(n)
    cyv = np.zeros(n)
    cxv[:-1] = (x[:-1] + x[1:]) * cross[:-1]
    cyv[:-1] = (y[:-1] + y[1:]) * cross[:-1]
    ends = starts[1:] - 1  # last coordinate of each ring: no outgoing segment
    cross[ends] = 0.0
    cxv[ends] = 0.0
    cyv[ends] = 0.0
    ring_a = 0.5 * np.add.reduceat(cross, starts[:-1])
    ring_cx = np.add.reduceat(cxv, starts[:-1])
    ring_cy = np.add.reduceat(cyv, starts[:-1])
    sign = np.where(np.asarray(shell), 1.0, -1.0)
    w = sign * np.abs(ring_a)
    areas += np.bincount(owner, weights=w, minlength=m)
    nz = ring_a != 0
    with np.errstate(divide="ignore", invalid="ignore"):
        rcx = np.where(nz, ring_cx / (6 * ring_a), 0.0)
        rcy = np.where(nz, ring_cy / (6 * ring_a), 0.0)
    wc = np.where(nz, w, 0.0)
    acc_x = np.bincount(owner, weights=wc * rcx, minlength=m)
    acc_y = np.bincount(owner, weights=wc * rcy, minlength=m)
    tot = np.bincount(owner, weights=wc, minlength=m)
    ok = tot != 0
    cents[ok, 0] = acc_x[ok] / tot[ok]
    cents[ok, 1] = acc_y[ok] / tot[ok]
    # degenerate polygons (all rings zero-area): mean of all coordinates
    # (matches centroid()'s fallback, closing vertex included)
    bad = np.zeros(m, dtype=bool)
    bad[idxs] = True
    bad &= ~ok
    if bad.any():
        co = np.repeat(owner, lens)
        csum_x = np.bincount(co, weights=x, minlength=m)
        csum_y = np.bincount(co, weights=y, minlength=m)
        cn = np.bincount(co, minlength=m)
        cents[bad, 0] = csum_x[bad] / cn[bad]
        cents[bad, 1] = csum_y[bad] / cn[bad]
    return areas, cents


def _line_batch_centroid(geoms: list, idxs: np.ndarray, cents: np.ndarray):
    parts, owners = [], []
    for i in idxs:
        g = geoms[i]
        lines = [g.data] if g.kind == LINESTRING else g.data
        for a in lines:
            parts.append(np.asarray(a, dtype=np.float64))
            owners.append(i)
    if not parts:
        return
    m = len(cents)
    coords, starts, owner, lens = _part_table(parts, owners)
    n = len(coords)
    x, y = coords[:, 0], coords[:, 1]
    w = np.zeros(n)
    wx = np.zeros(n)
    wy = np.zeros(n)
    seg = np.hypot(x[1:] - x[:-1], y[1:] - y[:-1])
    w[:-1] = seg
    wx[:-1] = seg * 0.5 * (x[:-1] + x[1:])
    wy[:-1] = seg * 0.5 * (y[:-1] + y[1:])
    ends = starts[1:] - 1
    w[ends] = 0.0
    wx[ends] = 0.0
    wy[ends] = 0.0
    pw = np.add.reduceat(w, starts[:-1])
    pwx = np.add.reduceat(wx, starts[:-1])
    pwy = np.add.reduceat(wy, starts[:-1])
    tot = np.bincount(owner, weights=pw, minlength=m)
    ax = np.bincount(owner, weights=pwx, minlength=m)
    ay = np.bincount(owner, weights=pwy, minlength=m)
    ok = np.zeros(m, dtype=bool)
    ok[idxs] = True
    nz = ok & (tot != 0)
    cents[nz, 0] = ax[nz] / tot[nz]
    cents[nz, 1] = ay[nz] / tot[nz]
    bad = ok & (tot == 0)  # zero-length: mean of all vertices
    if bad.any():
        co = np.repeat(owner, lens)
        cn = np.bincount(co, minlength=m)
        cents[bad, 0] = np.bincount(co, weights=x, minlength=m)[bad] / cn[bad]
        cents[bad, 1] = np.bincount(co, weights=y, minlength=m)[bad] / cn[bad]


def batch_area(geoms: list) -> np.ndarray:
    """area() over a list of Geom|None → float array (nan for None)."""
    m = len(geoms)
    out = np.zeros(m)
    kinds = np.array([-1 if g is None else g.kind for g in geoms])
    out[kinds == -1] = np.nan
    poly_idx = np.nonzero((kinds == POLYGON) | (kinds == MULTIPOLYGON))[0]
    if len(poly_idx):
        areas, _ = _polygon_batch(geoms, poly_idx, m)
        out[poly_idx] = areas[poly_idx]
    return out


def batch_centroid(geoms: list) -> np.ndarray:
    """centroid() over a list of Geom|None → (m,2) array (nan for None)."""
    m = len(geoms)
    cents = np.full((m, 2), np.nan)
    kinds = np.array([-1 if g is None else g.kind for g in geoms])
    poly_idx = np.nonzero((kinds == POLYGON) | (kinds == MULTIPOLYGON))[0]
    if len(poly_idx):
        _, pc = _polygon_batch(geoms, poly_idx, m)
        cents[poly_idx] = pc[poly_idx]
    line_idx = np.nonzero((kinds == LINESTRING) | (kinds == MULTILINESTRING))[0]
    if len(line_idx):
        _line_batch_centroid(geoms, line_idx, cents)
    for i in np.nonzero(kinds == POINT)[0]:
        cents[i] = np.asarray(geoms[i].data, dtype=np.float64)
    for i in np.nonzero(kinds == MULTIPOINT)[0]:
        cents[i] = geoms[i].data.mean(axis=0)
    return cents


def batch_length(geoms: list) -> np.ndarray:
    """length() over a list of Geom|None → float array (nan for None)."""
    m = len(geoms)
    out = np.zeros(m)
    parts, owners = [], []
    for i, g in enumerate(geoms):
        if g is None:
            out[i] = np.nan
            continue
        if g.kind == LINESTRING:
            arrs = [g.data]
        elif g.kind in (MULTILINESTRING, POLYGON):
            arrs = list(g.data)
        elif g.kind == MULTIPOLYGON:
            arrs = [r for rings in g.data for r in rings]
        else:
            continue
        for a in arrs:
            parts.append(np.asarray(a, dtype=np.float64))
            owners.append(i)
    if not parts:
        return out
    coords, starts, owner, _lens = _part_table(parts, owners)
    n = len(coords)
    x, y = coords[:, 0], coords[:, 1]
    w = np.zeros(n)
    w[:-1] = np.hypot(x[1:] - x[:-1], y[1:] - y[:-1])
    w[starts[1:] - 1] = 0.0
    pw = np.add.reduceat(w, starts[:-1])
    out += np.bincount(owner, weights=pw, minlength=m)
    return out


def batch_bounds(geoms: list) -> np.ndarray:
    """bounds() over a list of Geom|None → (m,4) xmin,ymin,xmax,ymax."""
    m = len(geoms)
    out = np.full((m, 4), np.nan)
    parts, owners = [], []
    for i, g in enumerate(geoms):
        if g is None:
            continue
        for a in _all_coords(g):
            parts.append(np.asarray(a, dtype=np.float64).reshape(-1, 2))
            owners.append(i)
    if not parts:
        return out
    coords, starts, owner, _lens = _part_table(parts, owners)
    pmin = np.minimum.reduceat(coords, starts[:-1], axis=0)
    pmax = np.maximum.reduceat(coords, starts[:-1], axis=0)
    gmin = np.full((m, 2), np.inf)
    gmax = np.full((m, 2), -np.inf)
    np.minimum.at(gmin, owner, pmin)
    np.maximum.at(gmax, owner, pmax)
    has = np.zeros(m, dtype=bool)
    has[owner] = True
    out[has, 0:2] = gmin[has]
    out[has, 2:4] = gmax[has]
    return out


# ---------------------------------------------------------------------------
# Predicates
# ---------------------------------------------------------------------------

def point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """Ray casting; boundary counts as inside."""
    if _PF is not None and len(ring) <= 8192:
        # C port (planar_fast.pt_in_ring): identical elementwise
        # expressions, fuzzed in tests/test_planar_fused.py
        return bool(_PF.pt_in_ring(
            float(px), float(py), ring[:, 0].tolist(), ring[:, 1].tolist()
        ))
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    # on-boundary check
    dx, dy = x1 - x0, y1 - y0
    cross = (px - x0) * dy - (py - y0) * dx
    dot = (px - x0) * dx + (py - y0) * dy
    seg_len2 = dx * dx + dy * dy
    on = (np.abs(cross) < 1e-12) & (dot >= -1e-12) & (dot <= seg_len2 + 1e-12)
    # a (near-)zero-length segment (duplicate consecutive vertex) trivially
    # passes the cross/dot test for EVERY point — count it only at the vertex
    on &= (seg_len2 >= 1e-24) | ((np.abs(px - x0) < 1e-12) & (np.abs(py - y0) < 1e-12))
    if bool(on.any()):
        return True
    cond = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * dx / dy
    hits = cond & (px < xint)
    return bool(np.count_nonzero(hits) % 2 == 1)


def point_in_polygon(px: float, py: float, rings) -> bool:
    if not point_in_ring(px, py, rings[0]):
        return False
    for hole in rings[1:]:
        if point_in_ring(px, py, hole) and not _point_on_ring(px, py, hole):
            return False
    return True


def _point_on_ring(px, py, ring) -> bool:
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    dx, dy = x1 - x0, y1 - y0
    cross = (px - x0) * dy - (py - y0) * dx
    dot = (px - x0) * dx + (py - y0) * dy
    seg_len2 = dx * dx + dy * dy
    on = (np.abs(cross) < 1e-12) & (dot >= -1e-12) & (dot <= seg_len2 + 1e-12)
    # near-zero-length segments match only at the vertex (see point_in_ring)
    on &= (seg_len2 >= 1e-24) | ((np.abs(px - x0) < 1e-12) & (np.abs(py - y0) < 1e-12))
    return bool(on.any())


def points_in_polygon_bulk(xs: np.ndarray, ys: np.ndarray, g: Geom) -> np.ndarray:
    """Vectorized closed-semantics PIP of many points vs one (multi)polygon:
    ray cast over the (points × edges) matrix + boundary test. Used by
    kernels that refine cell-join candidates after the shuffle."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if _PF is not None and g.kind == POLYGON and len(g.data) == 1:
        # single-ring C path (planar_fast.pip_ray): per-point ray cast with
        # the identical elementwise expressions — same booleans as the
        # numpy matrix below (fuzzed in tests/test_planar_fused.py)
        ring = np.asarray(g.data[0], dtype=np.float64)
        if len(ring) <= 8192:
            b = _PF.pip_ray(
                np.ascontiguousarray(xs).tobytes(),
                np.ascontiguousarray(ys).tobytes(),
                ring[:, 0].tolist(), ring[:, 1].tolist(),
            )
            return np.frombuffer(b, dtype=np.uint8).astype(bool)
    out = np.zeros(len(xs), dtype=bool)
    polys = [g.data] if g.kind == POLYGON else g.data
    for rings in polys:
        inside = _bulk_in_ring(xs, ys, rings[0])
        for hole in rings[1:]:
            on_hole = _bulk_on_ring(xs, ys, hole)
            inside &= ~(_bulk_in_ring(xs, ys, hole) & ~on_hole)
        out |= inside
    return out


def _bulk_in_ring(xs, ys, ring) -> np.ndarray:
    x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    P, Q = xs[:, None], ys[:, None]
    cond = (y0 > Q) != (y1 > Q)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (Q - y0) * (x1 - x0) / (y1 - y0)
    crossings = (cond & (P < xint)).sum(axis=1)
    return ((crossings % 2) == 1) | _bulk_on_ring(xs, ys, ring)


def _bulk_on_ring(xs, ys, ring) -> np.ndarray:
    x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    P, Q = xs[:, None], ys[:, None]
    dx, dy = x1 - x0, y1 - y0
    cross = (P - x0) * dy - (Q - y0) * dx
    dot = (P - x0) * dx + (Q - y0) * dy
    l2 = dx * dx + dy * dy
    on = (np.abs(cross) < 1e-12) & (dot >= -1e-12) & (dot <= l2 + 1e-12)
    # near-zero-length segments match only at the vertex (see point_in_ring)
    on &= (l2 >= 1e-24) | ((np.abs(P - x0) < 1e-12) & (np.abs(Q - y0) < 1e-12))
    return on.any(axis=1)


def contains_point(g: Geom, px: float, py: float) -> bool:
    if g.kind == POLYGON:
        return point_in_polygon(px, py, g.data)
    if g.kind == MULTIPOLYGON:
        return any(point_in_polygon(px, py, rings) for rings in g.data)
    raise ValueError("contains_point needs polygonal geometry")


def _segments(g: Geom) -> np.ndarray:
    """All segments as (m, 4) array [x0,y0,x1,y1]."""
    segs = []
    for arr in _all_coords(g):
        if len(arr) >= 2:
            segs.append(np.hstack([arr[:-1], arr[1:]]))
    if not segs:
        return np.zeros((0, 4))
    return np.vstack(segs)


def segments_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise (broadcast) proper-or-touching segment intersection test.

    a: (m,4), b: (n,4) → (m,n) bool. Vectorized orientation tests.
    """
    ax0, ay0, ax1, ay1 = (a[:, i][:, None] for i in range(4))
    bx0, by0, bx1, by1 = (b[:, i][None, :] for i in range(4))

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    d1 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    d2 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    d3 = orient(bx0, by0, bx1, by1, ax0, ay0)
    d4 = orient(bx0, by0, bx1, by1, ax1, ay1)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)

    def on_seg(px, py, qx, qy, rx, ry, d):
        return (
            (d == 0)
            & (np.minimum(px, qx) - 1e-15 <= rx)
            & (rx <= np.maximum(px, qx) + 1e-15)
            & (np.minimum(py, qy) - 1e-15 <= ry)
            & (ry <= np.maximum(py, qy) + 1e-15)
        )

    touch = (
        on_seg(ax0, ay0, ax1, ay1, bx0, by0, d1)
        | on_seg(ax0, ay0, ax1, ay1, bx1, by1, d2)
        | on_seg(bx0, by0, bx1, by1, ax0, ay0, d3)
        | on_seg(bx0, by0, bx1, by1, ax1, ay1, d4)
    )
    return proper | touch


def intersects(a: Geom, b: Geom) -> bool:
    """DE-9IM `intersects` over the supported kinds (bbox → vertex-in →
    edge-cross). Semantics match geopandas `sjoin(op='intersects')` usage at
    `prclz/etl/_split_buildings.py:58`, `prclz/_parcels.py:88`."""
    axmin, aymin, axmax, aymax = bounds(a)
    bxmin, bymin, bxmax, bymax = bounds(b)
    if axmin > bxmax or bxmin > axmax or aymin > bymax or bymin > aymax:
        return False
    if a.kind == POINT:
        return _geom_covers_point(b, a.data[0], a.data[1]) if b.kind in (POLYGON, MULTIPOLYGON) else _point_touches(b, a)
    if b.kind == POINT:
        return _geom_covers_point(a, b.data[0], b.data[1]) if a.kind in (POLYGON, MULTIPOLYGON) else _point_touches(a, b)
    sa, sb = _segments(a), _segments(b)
    if len(sa) and len(sb) and bool(segments_intersect(sa, sb).any()):
        return True
    # containment: any vertex of one inside the other
    if a.kind in (POLYGON, MULTIPOLYGON):
        for arr in _all_coords(b):
            if contains_point(a, arr[0, 0], arr[0, 1]):
                return True
    if b.kind in (POLYGON, MULTIPOLYGON):
        for arr in _all_coords(a):
            if contains_point(b, arr[0, 0], arr[0, 1]):
                return True
    return False


def _point_touches(g: Geom, p: Geom) -> bool:
    px, py = p.data
    for arr in _all_coords(g):
        if len(arr) == 1:
            if arr[0, 0] == px and arr[0, 1] == py:
                return True
        elif _point_on_ring(px, py, arr if np.array_equal(arr[0], arr[-1]) else np.vstack([arr, arr[:1]])):
            # _point_on_ring works on any polyline; avoid fake closing segment
            segs = np.hstack([arr[:-1], arr[1:]])
            dx = segs[:, 2] - segs[:, 0]
            dy = segs[:, 3] - segs[:, 1]
            cross = (px - segs[:, 0]) * dy - (py - segs[:, 1]) * dx
            dot = (px - segs[:, 0]) * dx + (py - segs[:, 1]) * dy
            l2 = dx * dx + dy * dy
            if bool(((np.abs(cross) < 1e-12) & (dot >= -1e-12) & (dot <= l2 + 1e-12)).any()):
                return True
    return False


def _geom_covers_point(g: Geom, px, py) -> bool:
    return contains_point(g, px, py)


def contains(a: Geom, b: Geom) -> bool:
    """a contains b (closed semantics: boundary points count). Used for the
    parcel⊇building QC check (`prclz/_parcels.py:231-237`)."""
    if a.kind not in (POLYGON, MULTIPOLYGON):
        return False
    for arr in _all_coords(b):
        for p in arr:
            if not contains_point(a, p[0], p[1]):
                return False
    # no boundary crossing that exits: if all vertices inside and no proper edge
    # crossings with shell, containment holds for our simple fixtures
    sa, sb = _segments(a), _segments(b)
    if len(sa) and len(sb):
        inter = segments_intersect(sa, sb)
        if bool(inter.any()):
            # allow touching (shared boundary) but not proper crossing; approximate
            # by testing midpoints of b's segments
            mids = 0.5 * (sb[:, :2] + sb[:, 2:])
            for m in mids:
                if not contains_point(a, m[0], m[1]):
                    return False
    return True


def distance(a: Geom, b: Geom) -> float:
    """Min Euclidean distance between the two geometries' segment/point sets."""
    pa = np.vstack(_all_coords(a))
    pb = np.vstack(_all_coords(b))
    sa, sb = _segments(a), _segments(b)
    if len(sa) and len(sb) and bool(segments_intersect(sa, sb).any()):
        return 0.0
    # a point-set can sit inside a polygon with no segment crossing — test
    # ALL points of the other side (a MULTIPOINT's first point may be out
    # while a later one is in)
    if a.kind in (POLYGON, MULTIPOLYGON) and bool(points_in_polygon_bulk(pb[:, 0], pb[:, 1], a).any()):
        return 0.0
    if b.kind in (POLYGON, MULTIPOLYGON) and bool(points_in_polygon_bulk(pa[:, 0], pa[:, 1], b).any()):
        return 0.0
    d = np.inf
    if len(sb):
        d = min(d, float(_pts_to_segs(pa, sb).min()))
    if len(sa):
        d = min(d, float(_pts_to_segs(pb, sa).min()))
    if not len(sa) and not len(sb):
        dd = pa[:, None, :] - pb[None, :, :]
        d = float(np.sqrt((dd ** 2).sum(-1)).min())
    return d


def _pts_to_segs(pts: np.ndarray, segs: np.ndarray) -> np.ndarray:
    """(p, s) matrix of point-to-segment distances (vectorized projection,
    reimplementing `prclz/reblock/_reblock_graph.py:95-181`)."""
    p = pts[:, None, :]
    a = segs[None, :, :2]
    b = segs[None, :, 2:]
    ab = b - a
    l2 = (ab ** 2).sum(-1)
    l2 = np.where(l2 == 0, 1e-300, l2)
    t = np.clip(((p - a) * ab).sum(-1) / l2, 0.0, 1.0)
    proj = a + t[..., None] * ab
    return np.sqrt(((p - proj) ** 2).sum(-1))


def nearest_point_on(g: Geom, px: float, py: float):
    """Closest point of g to (px,py) — `shapely.ops.nearest_points` analogue
    (`prclz/reblock/_reblock.py:125-130`)."""
    segs = _segments(g)
    if not len(segs):
        pts = np.vstack(_all_coords(g))
        i = int(np.argmin(((pts - [px, py]) ** 2).sum(1)))
        return pts[i]
    d = _pts_to_segs(np.array([[px, py]]), segs)[0]
    i = int(np.argmin(d))
    a, b = segs[i, :2], segs[i, 2:]
    ab = b - a
    l2 = float((ab ** 2).sum()) or 1e-300
    t = float(np.clip(np.dot([px, py] - a, ab) / l2, 0.0, 1.0))
    return a + t * ab


def explode(g: Geom):
    """Multipart → list of single-part Geoms (`prclz/_parcels.py:86`)."""
    if g.kind == MULTIPOLYGON:
        return [Geom(POLYGON, rings) for rings in g.data]
    if g.kind == MULTILINESTRING:
        return [Geom(LINESTRING, l) for l in g.data]
    if g.kind == MULTIPOINT:
        return [Geom(POINT, p.copy()) for p in g.data]
    return [g]


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns closed ring CCW."""
    pts = np.unique(np.asarray(pts, dtype=np.float64).reshape(-1, 2), axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.vstack(lower[:-1] + upper[:-1] + [lower[0]])
    return ring


def minimum_rotated_rectangle(pts: np.ndarray) -> np.ndarray:
    """Closed ring (5,2) of the minimum-area rotated rectangle enclosing
    `pts` — rotating calipers over the convex hull (shapely
    `minimum_rotated_rectangle` analogue, `prclz/reblock/_reblock.py:85`)."""
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    hull = convex_hull(pts)
    h = hull[:-1] if len(hull) > 2 and np.array_equal(hull[0], hull[-1]) else hull
    if len(h) == 1:
        return np.vstack([h[0]] * 5)
    if len(h) == 2:
        return np.asarray([h[0], h[1], h[1], h[0], h[0]])
    best = None
    n = len(h)
    for i in range(n):
        d = h[(i + 1) % n] - h[i]
        ln = float(np.hypot(d[0], d[1]))
        if ln < 1e-300:
            continue
        u = d / ln
        v = np.array([-u[1], u[0]])
        x = (h - h[i]) @ u
        y = (h - h[i]) @ v
        area = (x.max() - x.min()) * (y.max() - y.min())
        if best is None or area < best[0]:
            c = [
                h[i] + x.min() * u + y.min() * v,
                h[i] + x.max() * u + y.min() * v,
                h[i] + x.max() * u + y.max() * v,
                h[i] + x.min() * u + y.max() * v,
            ]
            best = (area, np.asarray(c + [c[0]]))
    return best[1]


def representative_point(g: Geom) -> np.ndarray:
    """A point guaranteed inside a polygonal geometry (shapely
    `representative_point` analogue, `prclz/reblock/_reblock.py:88`):
    the centroid when it is inside, else the midpoint of the widest
    interior span of a horizontal scanline through the bbox middle."""
    if g.kind not in (POLYGON, MULTIPOLYGON):
        return np.vstack(_all_coords(g))[0]
    c = centroid(g)
    if contains_point(g, float(c[0]), float(c[1])):
        return np.asarray(c, dtype=np.float64)
    xmin, ymin, xmax, ymax = bounds(g)
    best = None
    for frac in (0.5, 0.25, 0.75, 0.37, 0.63, 0.13, 0.87):
        cy = ymin + frac * (ymax - ymin)
        xs = []
        for arr in _all_coords(g):
            x0, y0 = arr[:-1, 0], arr[:-1, 1]
            x1, y1 = arr[1:, 0], arr[1:, 1]
            crossing = (y0 > cy) != (y1 > cy)
            with np.errstate(divide="ignore", invalid="ignore"):
                xi = x0 + (cy - y0) * (x1 - x0) / (y1 - y0)
            xs.extend(xi[crossing].tolist())
        xs.sort()
        for a, b in zip(xs[:-1], xs[1:]):
            mid = 0.5 * (a + b)
            if contains_point(g, mid, cy):
                span = b - a
                if best is None or span > best[0]:
                    best = (span, np.array([mid, cy]))
        if best is not None:
            return best[1]
    return np.asarray(c, dtype=np.float64)  # degenerate fallback


# ---------------------------------------------------------------------------
# Mercator transform (EPSG:4326 ↔ 3395), `prclz/_parcels.py:34-35,48`
# ---------------------------------------------------------------------------

_A = 6378137.0
_E = 0.081819190842621486


def mercator_fwd(lonlat: np.ndarray) -> np.ndarray:
    lon = np.radians(lonlat[..., 0])
    lat = np.radians(lonlat[..., 1])
    x = _A * lon
    es = _E * np.sin(lat)
    y = _A * np.log(np.tan(np.pi / 4 + lat / 2) * ((1 - es) / (1 + es)) ** (_E / 2))
    return np.stack([x, y], axis=-1)


def mercator_inv(xy: np.ndarray) -> np.ndarray:
    lon = xy[..., 0] / _A
    t = np.exp(-xy[..., 1] / _A)
    lat = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):  # fixed-point iteration for ellipsoidal latitude
        es = _E * np.sin(lat)
        lat = np.pi / 2 - 2 * np.arctan(t * ((1 - es) / (1 + es)) ** (_E / 2))
    return np.stack([np.degrees(lon), np.degrees(lat)], axis=-1)


def haversine_m(lon0, lat0, lon1, lat1):
    """Geodesic distance in meters (`prclz/reblock/_reblock_graph.py:76-82`)."""
    r = 6371008.8
    p0, p1 = math.radians(lat0), math.radians(lat1)
    dp = p1 - p0
    dl = math.radians(lon1 - lon0)
    a = math.sin(dp / 2) ** 2 + math.cos(p0) * math.cos(p1) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(a))
