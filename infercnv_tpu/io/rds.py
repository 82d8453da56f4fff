"""Minimal pure-Python reader for R serialization (RDS / RDA version 2-3, XDR).

The reference package ships its golden outputs as ``data/*.rda`` (R workspace
archives; reference ``R/data.R:1-43``) and accepts ``.rds`` counts matrices as
input (``R/inferCNV.R:146-165``).  Neither ``pyreadr`` nor ``rdata`` is
available in this image, so this module implements the subset of R's
``serialize()`` format (format "X\\n" = big-endian XDR) needed to read those
files: atomic vectors, pairlists, generic vectors, S4 objects, environments,
factors, data.frames, dgCMatrix, and the ALTREP compact sequences R >= 3.5
emits for ``row.names``.

This is an original implementation from the publicly documented format
(R internals manual, "Serialization Formats"); no code is derived from the
reference repository (which is pure R and contains no reader either).
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import struct
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# SEXP type codes (R internals)
NILSXP = 0
SYMSXP = 1
LISTSXP = 2
CLOSXP = 3
ENVSXP = 4
PROMSXP = 5
LANGSXP = 6
SPECIALSXP = 7
BUILTINSXP = 8
CHARSXP = 9
LGLSXP = 10
INTSXP = 13
REALSXP = 14
CPLXSXP = 15
STRSXP = 16
DOTSXP = 17
VECSXP = 19
EXPRSXP = 20
BCODESXP = 21
EXTPTRSXP = 22
WEAKREFSXP = 23
RAWSXP = 24
S4SXP = 25

# pseudo-codes used by the serializer
REFSXP = 255
NILVALUE_SXP = 254
GLOBALENV_SXP = 253
UNBOUNDVALUE_SXP = 252
MISSINGARG_SXP = 251
BASENAMESPACE_SXP = 250
NAMESPACESXP = 249
PACKAGESXP = 248
PERSISTSXP = 247
CLASSREFSXP = 246
GENERICREFSXP = 245
BCREPDEF = 244
BCREPREF = 243
EMPTYENV_SXP = 242
BASEENV_SXP = 241
ATTRLISTSXP = 240
ALTREP_SXP = 238

R_NA_INT = -2147483648


@dataclass
class RObj:
    """An R value with attributes (class, names, dim, levels, slots...)."""

    value: Any
    attrs: Dict[str, Any] = field(default_factory=dict)

    @property
    def rclass(self) -> Optional[List[str]]:
        cls = self.attrs.get("class")
        if cls is None:
            return None
        return list(strip(cls)) if not isinstance(cls, str) else [cls]

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"RObj({type(self.value).__name__}, attrs={list(self.attrs)})"


class RNull:
    """R NULL singleton."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "R_NULL"


class REnv:
    """R environment — kept only so references resolve; contents as dict."""

    def __init__(self):
        self.frame: Dict[str, Any] = {}


class _Sym(str):
    """Interned symbol name."""


def strip(x):
    """Unwrap RObj -> raw value (one level)."""
    return x.value if isinstance(x, RObj) else x


class _Reader:
    def __init__(self, data: bytes):
        self._b = data
        self._pos = 0
        self._refs: List[Any] = []

    # -- primitives (XDR = big-endian) ------------------------------------
    def _take(self, n: int) -> bytes:
        b = self._b[self._pos:self._pos + n]
        if len(b) != n:
            raise EOFError("truncated RDS stream")
        self._pos += n
        return b

    def u8(self) -> int:
        return self._take(1)[0]

    def i4(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def f8(self) -> float:
        return struct.unpack(">d", self._take(8))[0]

    def ints(self, n: int) -> np.ndarray:
        return np.frombuffer(self._take(4 * n), dtype=">i4").astype(np.int32)

    def doubles(self, n: int) -> np.ndarray:
        return np.frombuffer(self._take(8 * n), dtype=">f8").astype(np.float64)

    def length(self) -> int:
        n = self.i4()
        if n == -1:  # long vector: two 32-bit halves
            hi = self.i4() & 0xFFFFFFFF
            lo = self.i4() & 0xFFFFFFFF
            return (hi << 32) | lo
        return n

    # -- header ------------------------------------------------------------
    def read_header(self):
        fmt = self._take(2)
        if fmt == b"A\n":
            raise NotImplementedError("ASCII serialization not supported")
        if fmt not in (b"X\n", b"B\n"):
            raise ValueError(f"unknown serialization format {fmt!r}")
        if fmt == b"B\n":
            raise NotImplementedError("native-binary serialization not supported")
        version = self.i4()
        self.i4()  # writer version
        self.i4()  # min reader version
        if version >= 3:
            enc_len = self.i4()
            self._take(enc_len)  # native encoding name
        return version

    # -- items ---------------------------------------------------------------
    def item(self) -> Any:
        flags = self.i4()
        ptype = flags & 0xFF
        is_obj = bool(flags & 0x100)
        has_attr = bool(flags & 0x200)
        has_tag = bool(flags & 0x400)
        del is_obj

        if ptype == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.i4()
            return self._refs[idx - 1]
        if ptype == NILVALUE_SXP or ptype == NILSXP:
            return RNull()
        if ptype == GLOBALENV_SXP or ptype == EMPTYENV_SXP or ptype == BASEENV_SXP \
                or ptype == BASENAMESPACE_SXP:
            return RNull()
        if ptype in (UNBOUNDVALUE_SXP, MISSINGARG_SXP):
            return RNull()
        if ptype in (NAMESPACESXP, PACKAGESXP, PERSISTSXP):
            # persistent string vec: flags already consumed; read string vector
            self.i4()  # dummy "0" flag per format
            n = self.i4()
            strs = [self._charsxp() for _ in range(n)]
            ref = RObj(strs, {"R_type": "namespace"})
            self._refs.append(ref)
            return ref

        if ptype == SYMSXP:
            ch = self.item()  # CHARSXP
            sym = _Sym(ch if isinstance(ch, str) else str(ch))
            self._refs.append(sym)
            return sym

        if ptype == ENVSXP:
            env = REnv()
            self._refs.append(env)
            self.i4()  # locked
            self.item()  # enclosure
            frame = self.item()  # frame (pairlist)
            hashtab = self.item()  # hash table (list of pairlists)
            self.item()  # attributes
            for src in (frame,) if not isinstance(frame, RNull) else ():
                for k, v in _pairlist_items(src):
                    env.frame[k] = v
            if isinstance(hashtab, (list, RObj)):
                for slot in (strip(hashtab) or []):
                    for k, v in _pairlist_items(slot):
                        env.frame[k] = v
            return env

        if ptype in (LISTSXP, LANGSXP, CLOSXP, PROMSXP, DOTSXP):
            attrs = self._read_attrs_dict() if has_attr else {}
            tag = self.item() if has_tag else None
            car = self.item()
            cdr = self.item()
            node = RPair(tag=tag, car=car, cdr=cdr)
            if attrs:
                return RObj(node, attrs)
            return node

        if ptype == CHARSXP:
            return self._charsxp_body()

        if ptype == ALTREP_SXP:
            info = self.item()  # pairlist: (class . (package . type))
            state = self.item()
            attrs_node = self.item()  # attributes (dim/names/class/levels)
            val = self._decode_altrep(info, state)
            attrs = {k: v for k, v in _pairlist_items(attrs_node)}
            if attrs:
                return RObj(strip(val), {**(val.attrs if isinstance(val, RObj)
                                            else {}), **attrs})
            return val

        if ptype in (SPECIALSXP, BUILTINSXP):
            n = self.i4()
            self._take(n)
            return RNull()

        if ptype == LGLSXP:
            n = self.length()
            vals = self.ints(n)
            out = np.where(vals == R_NA_INT, -1, vals).astype(np.int8)
            obj = _MaskedBool(out)
        elif ptype == INTSXP:
            n = self.length()
            obj = self.ints(n)
        elif ptype == REALSXP:
            n = self.length()
            obj = self.doubles(n)
        elif ptype == CPLXSXP:
            n = self.length()
            d = self.doubles(2 * n)
            obj = d[0::2] + 1j * d[1::2]
        elif ptype == STRSXP:
            n = self.length()
            obj = [self._charsxp() for _ in range(n)]
        elif ptype in (VECSXP, EXPRSXP):
            n = self.length()
            obj = [self.item() for _ in range(n)]
        elif ptype == RAWSXP:
            n = self.length()
            obj = self._take(n)
        elif ptype == S4SXP:
            attrs = self._read_attrs_dict() if has_attr else {}
            return RObj({"R_S4": True}, attrs)
        elif ptype == BCODESXP:
            raise NotImplementedError("bytecode objects not supported")
        elif ptype in (EXTPTRSXP, WEAKREFSXP):
            ref = RNull()
            self._refs.append(ref)
            return ref
        else:
            raise NotImplementedError(f"SEXP type {ptype} not supported")

        if has_attr:
            attrs = self._read_attrs_dict()
            return RObj(obj, attrs)
        return obj

    def _charsxp(self) -> Optional[str]:
        flags = self.i4()
        ptype = flags & 0xFF
        if ptype == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.i4()
            return self._refs[idx - 1]
        if ptype != CHARSXP:
            raise ValueError(f"expected CHARSXP, got type {ptype}")
        return self._charsxp_body()

    def _charsxp_body(self) -> Optional[str]:
        n = self.i4()
        if n == -1:
            return None  # NA_character_
        return self._take(n).decode("utf-8", errors="replace")

    def _read_attrs_dict(self) -> Dict[str, Any]:
        attrs: Dict[str, Any] = {}
        node = self.item()
        for k, v in _pairlist_items(node):
            attrs[k] = v
        return attrs

    def _decode_altrep(self, info, state):
        info = strip(info)
        cls_name = ""
        if isinstance(info, RPair):
            cls_name = str(info.car)
        if cls_name == "compact_intseq":
            n, start, step = strip(state)
            return (np.arange(int(n)) * int(step) + int(start)).astype(np.int32)
        if cls_name == "compact_realseq":
            n, start, step = strip(state)
            return np.arange(int(n)) * float(step) + float(start)
        if cls_name in ("wrap_real", "wrap_integer", "wrap_logical",
                        "wrap_string", "wrap_complex", "wrap_raw"):
            st = strip(state)
            if isinstance(st, RPair):
                return st.car
            return st
        if cls_name == "deferred_string":
            st = strip(state)
            src = st.car if isinstance(st, RPair) else st
            arr = np.asarray(strip(src))
            return [_fmt_r(v) for v in arr]
        raise NotImplementedError(f"ALTREP class {cls_name!r} not supported")


def _fmt_r(v) -> str:
    if isinstance(v, (np.floating, float)):
        if float(v).is_integer():
            return str(int(v))
        return repr(float(v))
    return str(v)


@dataclass
class RPair:
    tag: Any
    car: Any
    cdr: Any


class _MaskedBool(np.ndarray):
    """Logical vector: 1=TRUE, 0=FALSE, -1=NA."""

    def __new__(cls, arr):
        return np.asarray(arr).view(cls)


def _pairlist_items(node):
    node = strip(node)
    while isinstance(node, RPair):
        tag = node.tag
        yield (str(tag) if tag is not None else None, node.car)
        node = strip(node.cdr)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _decompress(path: str) -> bytes:
    with open(path, "rb") as f:
        magic = f.read(6)
    if magic[:2] == b"\x1f\x8b":
        with gzip.open(path, "rb") as f:
            return f.read()
    if magic[:6] == b"\xfd7zXZ\x00":
        with lzma.open(path, "rb") as f:
            return f.read()
    if magic[:3] == b"BZh":
        with bz2.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def read_rds(path: str) -> Any:
    """Read a ``saveRDS()`` file -> python object."""
    data = _decompress(path)
    r = _Reader(data)
    r.read_header()
    return r.item()


def read_rda(path: str) -> Dict[str, Any]:
    """Read a ``save()`` workspace (.rda/.RData) -> {name: object}."""
    data = _decompress(path)
    if data[:5] not in (b"RDX2\n", b"RDX3\n"):
        raise ValueError(f"not an RDA file (magic {data[:5]!r})")
    r = _Reader(data[5:])
    r.read_header()
    top = r.item()
    out: Dict[str, Any] = {}
    for name, val in _pairlist_items(top):
        out[name] = val
    return out


# -- conversion helpers ------------------------------------------------------

def r_matrix(obj) -> Tuple[np.ndarray, List[str], List[str]]:
    """R matrix -> (2-D array [rows, cols], rownames, colnames).

    R stores matrices column-major with a ``dim`` attribute.
    """
    if not isinstance(obj, RObj):
        raise TypeError("expected RObj with dim attribute")
    dim = np.asarray(strip(obj.attrs["dim"])).astype(int)
    arr = np.asarray(obj.value).reshape(tuple(dim), order="F")
    dn = obj.attrs.get("dimnames")
    rown: List[str] = []
    coln: List[str] = []
    if dn is not None and not isinstance(dn, RNull):
        dn = strip(dn)
        if len(dn) >= 1 and not isinstance(dn[0], RNull):
            rown = [str(s) for s in strip(dn[0])]
        if len(dn) >= 2 and not isinstance(dn[1], RNull):
            coln = [str(s) for s in strip(dn[1])]
    return arr, rown, coln


def r_factor(obj) -> List[str]:
    """R factor -> list of level strings per element."""
    codes = np.asarray(strip(obj)).astype(int)
    levels = [str(s) for s in strip(obj.attrs["levels"])]
    return [levels[c - 1] if c > 0 else None for c in codes]


def r_data_frame(obj) -> Dict[str, Any]:
    """R data.frame -> {"__rownames__": [...], col: values} preserving order."""
    cols = strip(obj)
    names = [str(s) for s in strip(obj.attrs["names"])]
    rn = obj.attrs.get("row.names")
    out: Dict[str, Any] = {}
    if rn is not None and not isinstance(rn, RNull):
        rnv = strip(rn)
        if isinstance(rnv, np.ndarray) and rnv.dtype.kind in "if":
            n = len(rnv)
            if n == 2 and int(rnv[0]) == R_NA_INT:
                rnv = np.arange(1, abs(int(rnv[1])) + 1)
            out["__rownames__"] = [str(int(v)) for v in rnv]
        else:
            out["__rownames__"] = [str(s) for s in rnv]
    for name, col in zip(names, cols):
        if isinstance(col, RObj) and col.rclass and "factor" in col.rclass:
            out[name] = r_factor(col)
        else:
            out[name] = strip(col)
    return out


def r_list(obj) -> Dict[str, Any]:
    """Named R list -> dict (unnamed entries get positional int keys)."""
    vals = strip(obj)
    if isinstance(vals, RNull):
        return {}
    names_attr = obj.attrs.get("names") if isinstance(obj, RObj) else None
    names = [str(s) if s is not None else None for s in strip(names_attr)] \
        if names_attr is not None and not isinstance(names_attr, RNull) else []
    out: Dict[str, Any] = {}
    for i, v in enumerate(vals):
        key = names[i] if i < len(names) and names[i] else i
        out[key] = v
    return out


def s4_slots(obj: RObj) -> Dict[str, Any]:
    """S4 object -> slot dict (class attr removed)."""
    slots = dict(obj.attrs)
    slots.pop("class", None)
    return slots


def write_rds_matrix(path: str, mat: np.ndarray,
                     rownames: Optional[List[str]] = None,
                     colnames: Optional[List[str]] = None) -> None:
    """Write a numeric matrix as a gzipped .rds readable by R's readRDS().

    Lets R users of the reference package consume this framework's outputs
    directly (and provides .rds fixtures for tests).  Thin wrapper over the
    general serializer (write_rds + RMatrix) so matrix emission exists in
    exactly one place."""
    write_rds(path, RMatrix(np.asarray(mat, np.float64),
                            rownames=rownames, colnames=colnames))


class _RdsWriter:
    """Emitter for R serialization format version 2 (XDR).

    Original implementation from the documented format (R internals manual,
    "Serialization Formats") — the counterpart of :class:`_Reader`.  No
    reference-table compression is emitted (fresh SYMSXP per use), which is
    valid input for R's readRDS().
    """

    def __init__(self):
        self._out = io.BytesIO()

    # -- primitives --------------------------------------------------------
    def wi(self, v: int) -> None:
        self._out.write(struct.pack(">i", v))

    def wlen(self, n: int) -> None:
        """Vector length: R's long-vector encoding (-1 + two 32-bit
        halves) above 2^31-1 — struct.pack('>i') would raise there, and
        this project's envelope (100k+ cells x tens of k genes) crosses
        2^31 elements."""
        if n <= 0x7FFFFFFF:
            self.wi(n)
        else:
            self.wi(-1)
            # the halves are raw unsigned 32-bit words: a low half in
            # [2^31, 2^32) would overflow struct.pack('>i')
            self._out.write(struct.pack(">I", (n >> 32) & 0xFFFFFFFF))
            self._out.write(struct.pack(">I", n & 0xFFFFFFFF))

    def header(self) -> None:
        self._out.write(b"X\n")
        self.wi(2)          # serialization version
        self.wi(0x030500)   # writer R version
        self.wi(0x020300)   # min reader R version

    def _flags(self, ptype: int, has_attr: bool = False, has_tag: bool = False,
               is_obj: bool = False, levels: int = 0) -> None:
        self.wi(ptype | (levels << 12) | (0x100 if is_obj else 0)
                | (0x200 if has_attr else 0) | (0x400 if has_tag else 0))

    def charsxp(self, s: str) -> None:
        b = str(s).encode("utf-8")
        self._flags(CHARSXP, levels=8)  # UTF-8 encoding bit
        self.wi(len(b))
        self._out.write(b)

    def sym(self, name: str) -> None:
        self._flags(SYMSXP)
        self.charsxp(name)

    def null(self) -> None:
        self.wi(NILVALUE_SXP)

    # -- attribute pairlist -------------------------------------------------
    def attrs(self, pairs: List[Tuple[str, Any]]) -> None:
        """Emit an attribute pairlist [(name, python value)...] + NIL."""
        for name, value in pairs:
            self._flags(LISTSXP, has_tag=True)
            self.sym(name)
            self.value(value)
        self.null()

    # -- vectors -------------------------------------------------------------
    def int_vec(self, arr, attr_pairs: Optional[List] = None,
                is_obj: bool = False) -> None:
        arr = np.asarray(arr, np.int32).ravel()
        self._flags(INTSXP, has_attr=bool(attr_pairs), is_obj=is_obj)
        self.wlen(arr.size)
        self._out.write(arr.astype(">i4").tobytes())
        if attr_pairs:
            self.attrs(attr_pairs)

    def real_vec(self, arr, attr_pairs: Optional[List] = None) -> None:
        arr = np.asarray(arr, np.float64).ravel()
        self._flags(REALSXP, has_attr=bool(attr_pairs))
        self.wlen(arr.size)
        self._out.write(arr.astype(">f8").tobytes())
        if attr_pairs:
            self.attrs(attr_pairs)

    def lgl_vec(self, arr, attr_pairs: Optional[List] = None) -> None:
        arr = np.asarray(arr, bool).ravel()
        self._flags(LGLSXP, has_attr=bool(attr_pairs))
        self.wlen(arr.size)
        self._out.write(arr.astype(">i4").tobytes())
        if attr_pairs:
            self.attrs(attr_pairs)

    def str_vec(self, strs: List[str], attr_pairs: Optional[List] = None,
                is_obj: bool = False) -> None:
        self._flags(STRSXP, has_attr=bool(attr_pairs), is_obj=is_obj)
        self.wlen(len(strs))
        for s in strs:
            self.charsxp(s)
        if attr_pairs:
            self.attrs(attr_pairs)

    def vec_list(self, items: List[Any], attr_pairs: Optional[List] = None,
                 is_obj: bool = False) -> None:
        self._flags(VECSXP, has_attr=bool(attr_pairs), is_obj=is_obj)
        self.wlen(len(items))
        for it in items:
            self.value(it)
        if attr_pairs:
            self.attrs(attr_pairs)

    # -- composites ----------------------------------------------------------
    def named_list(self, d: Dict[str, Any],
                   extra_attrs: Optional[List] = None,
                   is_obj: bool = False) -> None:
        pairs: List = [("names", RString(list(d.keys())))] if d else []
        pairs += list(extra_attrs or [])
        self.vec_list(list(d.values()), attr_pairs=pairs or None,
                      is_obj=is_obj)

    def matrix(self, mat: np.ndarray, rownames=None, colnames=None) -> None:
        """Numeric matrix [rows, cols], column-major, dim + dimnames attrs."""
        mat = np.asarray(mat, np.float64)
        pairs: List = [("dim", RInt(np.asarray(mat.shape, np.int32)))]
        if rownames is not None or colnames is not None:
            dn = [RString([str(s) for s in rownames]) if rownames is not None else RNull(),
                  RString([str(s) for s in colnames]) if colnames is not None else RNull()]
            pairs.append(("dimnames", dn))
        self._flags(REALSXP, has_attr=True)
        self.wlen(mat.size)
        self._out.write(np.asarray(mat, ">f8").tobytes(order="F"))
        self.attrs(pairs)

    def factor(self, values: List[str]) -> None:
        levels = sorted(set(str(v) for v in values))
        lut = {v: i + 1 for i, v in enumerate(levels)}
        codes = np.asarray([lut[str(v)] for v in values], np.int32)
        self.int_vec(codes, attr_pairs=[("levels", RString(levels)),
                                        ("class", RString(["factor"]))],
                     is_obj=True)

    def data_frame(self, cols: Dict[str, Any], rownames: List[str]) -> None:
        self.named_list(
            dict(cols),
            extra_attrs=[("class", RString(["data.frame"])),
                         ("row.names", RString([str(r) for r in rownames]))],
            is_obj=True)

    def s4(self, class_name: str, package: str,
           slots: List[Tuple[str, Any]]) -> None:
        # levels bit 16 = S4_OBJECT_MASK: without it R's readRDS() yields
        # isS4() == FALSE and S4 dispatch breaks (R emits 0x10319 for the
        # flags word of a real S4 infercnv object; 0x319 without the bit)
        self._flags(S4SXP, has_attr=True, is_obj=True, levels=16)
        self.attrs(list(slots) + [
            ("class", RString([class_name],
                              attrs=[("package", RString([package]))]))])

    # -- generic dispatch ------------------------------------------------------
    def value(self, v: Any) -> None:
        if isinstance(v, _Emit):
            v.emit(self)
        elif v is None or isinstance(v, RNull):
            self.null()
        elif isinstance(v, bool):
            self.lgl_vec([v])
        elif isinstance(v, (int, np.integer)):
            self.int_vec([int(v)])
        elif isinstance(v, (float, np.floating)):
            self.real_vec([float(v)])
        elif isinstance(v, str):
            self.str_vec([v])
        elif isinstance(v, np.ndarray):
            if v.dtype.kind in "iu":
                self.int_vec(v)
            elif v.dtype.kind == "b":
                self.lgl_vec(v)
            else:
                self.real_vec(v)
        elif isinstance(v, dict):
            self.named_list(v)
        elif isinstance(v, (list, tuple)):
            if all(isinstance(s, str) for s in v) and len(v) > 0:
                self.str_vec(list(v))
            else:
                self.vec_list(list(v))
        else:
            raise TypeError(f"cannot serialize {type(v).__name__} to RDS")

    def finish(self, path: str, compresslevel: int = 6) -> None:
        with gzip.open(path, "wb", compresslevel=compresslevel) as f:
            f.write(self._out.getvalue())


class _Emit:
    """Marker base for typed wrapper values understood by _RdsWriter.value."""

    def emit(self, w: _RdsWriter) -> None:  # pragma: no cover - interface
        raise NotImplementedError


@dataclass
class RString(_Emit):
    strs: List[str]
    attrs: Optional[List] = None

    def emit(self, w: _RdsWriter) -> None:
        w.str_vec([str(s) for s in self.strs], attr_pairs=self.attrs)


@dataclass
class RInt(_Emit):
    arr: Any

    def emit(self, w: _RdsWriter) -> None:
        w.int_vec(self.arr)


@dataclass
class RFactor(_Emit):
    values: List[str]

    def emit(self, w: _RdsWriter) -> None:
        w.factor(self.values)


@dataclass
class RMatrix(_Emit):
    mat: Any
    rownames: Optional[List[str]] = None
    colnames: Optional[List[str]] = None

    def emit(self, w: _RdsWriter) -> None:
        w.matrix(self.mat, self.rownames, self.colnames)


@dataclass
class RDataFrame(_Emit):
    cols: Dict[str, Any]
    rownames: List[str]

    def emit(self, w: _RdsWriter) -> None:
        w.data_frame(self.cols, self.rownames)


@dataclass
class RS4(_Emit):
    class_name: str
    package: str
    slots: List[Tuple[str, Any]]

    def emit(self, w: _RdsWriter) -> None:
        w.s4(self.class_name, self.package, self.slots)


def write_rds(path: str, value: Any, compresslevel: int = 6) -> None:
    """Serialize ``value`` as a gzipped .rds readable by R's readRDS().

    Accepts plain python values (scalars, strings, arrays, dicts as named
    lists) and the typed wrappers (RMatrix, RDataFrame, RFactor, RS4...)."""
    w = _RdsWriter()
    w.header()
    w.value(value)
    w.finish(path, compresslevel=compresslevel)


def save_rds_infercnv(obj, path: str, options: Optional[Dict[str, Any]] = None,
                      compresslevel: int = 4) -> None:
    """Write an infercnv object as the S4 ``infercnv`` RDS the reference
    ecosystem consumes (slots per R/inferCNV.R:37-47; the reference's own
    add_to_seurat reads ``run.final.infercnv_obj`` from out_dir this way,
    seurat_interaction.R:23-50).

    Matrices are written genes x cells (R orientation); cell indices are
    1-based as in R.  The stored hclust trees are not serialized (our
    heatmap engine derives trees from the expression matrix at plot time);
    ``tumor_subclusters$hc`` is an empty list.
    """
    go = obj.gene_order
    gene_names = [str(n) for n in go.names]
    cell_names = [str(c) for c in obj.cell_names]
    chrs = [str(go.chr_names[c]) for c in go.chr_ids]

    def idx_list(groups: Dict[str, np.ndarray]) -> Dict[str, Any]:
        return {str(g): RInt(np.asarray(v, np.int64) + 1)
                for g, v in groups.items()}

    subclusters: Dict[str, Any] = {}
    if obj.tumor_subclusters:
        for g, subs in obj.tumor_subclusters["subclusters"].items():
            subclusters[str(g)] = idx_list(subs)
    tumor_subclusters = ({"subclusters": subclusters, "hc": {}}
                         if subclusters else None)

    counts = (obj.counts if obj.counts is not None
              and obj.counts.shape == obj.expr.shape else obj.expr)
    opts: Dict[str, Any] = dict(options or {})
    slots: List[Tuple[str, Any]] = [
        ("expr.data", RMatrix(np.asarray(obj.expr, np.float64).T,
                              rownames=gene_names, colnames=cell_names)),
        ("count.data", RMatrix(np.asarray(counts, np.float64).T,
                               rownames=gene_names, colnames=cell_names)),
        ("gene_order", RDataFrame(
            {"chr": RFactor(chrs),
             "start": RInt(np.asarray(go.start, np.int64)),
             "stop": RInt(np.asarray(go.stop, np.int64))},
            rownames=gene_names)),
        ("reference_grouped_cell_indices", idx_list(obj.ref_groups)),
        ("observation_grouped_cell_indices", idx_list(obj.obs_groups)),
        ("tumor_subclusters", tumor_subclusters),
        ("options", opts),
        (".hspike", None),
    ]
    write_rds(path, RS4("infercnv", "infercnv", slots),
              compresslevel=compresslevel)


def read_rds_infercnv(path: str):
    """Read an S4 ``infercnv`` RDS (ours or the reference's) back into an
    :class:`~infercnv_tpu.core.object.InferCNV`."""
    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.core.object import InferCNV

    top = read_rds(path)
    if not isinstance(top, RObj):
        raise ValueError(f"{path!r} does not contain an S4 object")
    sl = s4_slots(top)
    expr_t, gene_names, cell_names = r_matrix(sl["expr.data"])
    try:
        counts_t, _, _ = r_matrix(sl["count.data"])
        if counts_t.shape != expr_t.shape:
            counts_t = expr_t
    except (KeyError, TypeError):
        counts_t = expr_t
    gof = r_data_frame(sl["gene_order"])
    chr_strs = [str(c) for c in gof["chr"]]
    chr_names: List[str] = []
    for c in chr_strs:
        if c not in chr_names:
            chr_names.append(c)
    chr_ids = np.asarray([chr_names.index(c) for c in chr_strs], np.int32)
    go = GeneOrder(
        names=tuple(gene_names or gof.get("__rownames__", [])),
        chr_names=tuple(chr_names),
        chr_ids=chr_ids,
        start=np.asarray(gof["start"], np.int64),
        stop=np.asarray(gof["stop"], np.int64),
    )

    def groups_of(slot) -> Dict[str, np.ndarray]:
        if isinstance(slot, RNull) or slot is None:
            return {}
        return {str(g): np.asarray(strip(v), np.int64) - 1
                for g, v in r_list(slot).items()}

    out = InferCNV(
        expr=np.asarray(expr_t, np.float32).T,
        counts=np.asarray(counts_t, np.float32).T,
        gene_order=go,
        cell_names=list(cell_names),
        ref_groups=groups_of(sl.get("reference_grouped_cell_indices")),
        obs_groups=groups_of(sl.get("observation_grouped_cell_indices")),
    )
    ts = sl.get("tumor_subclusters")
    if ts is not None and not isinstance(ts, RNull):
        tl = r_list(ts)
        subs_r = tl.get("subclusters")
        if subs_r is not None and not isinstance(subs_r, RNull):
            out.tumor_subclusters = {
                "subclusters": {str(g): groups_of(v)
                                for g, v in r_list(subs_r).items()},
                "hc": {},
            }
    opt = sl.get("options")
    if opt is not None and not isinstance(opt, RNull):
        for k, v in r_list(opt).items():
            vv = strip(v)
            if isinstance(vv, np.ndarray) and vv.size == 1:
                vv = vv.item()
            elif isinstance(vv, list) and len(vv) == 1:
                vv = vv[0]
            out.options[str(k)] = vv
    return out


def r_dgc_matrix(obj: RObj) -> "Any":
    """dgCMatrix S4 -> scipy.sparse.csc_matrix."""
    import scipy.sparse as sp

    sl = s4_slots(obj)
    i = np.asarray(strip(sl["i"])).astype(np.int64)
    p = np.asarray(strip(sl["p"])).astype(np.int64)
    x = np.asarray(strip(sl["x"]))
    dim = np.asarray(strip(sl["Dim"])).astype(int)
    m = sp.csc_matrix((x, i, p), shape=tuple(dim))
    dn = sl.get("Dimnames")
    rown, coln = [], []
    if dn is not None:
        dnv = strip(dn)
        if len(dnv) >= 1 and not isinstance(dnv[0], RNull):
            rown = [str(s) for s in strip(dnv[0])]
        if len(dnv) >= 2 and not isinstance(dnv[1], RNull):
            coln = [str(s) for s in strip(dnv[1])]
    return m, rown, coln
