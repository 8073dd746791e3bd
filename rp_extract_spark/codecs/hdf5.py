"""Pure-numpy HDF5 subset codec (no h5py/pytables in the container).

Scope: exactly the layout the reference's feature store uses —
``HDF5FeatureWriter`` (rp_feature_io.py:93-264) creates one root group
holding chunked EArrays ``vec`` (float64/float32, shape (N, dim),
attrs ``vec_dim``/``vec_type``), ``file_ids`` and ``file_ids2``
(fixed 256-byte strings), written by libhdf5 as: superblock version
0, version-1 object headers, group symbol tables (v1 B-tree + SNOD +
local heap), chunked data layout v3 indexed by a v1 B-tree, and an
optional deflate(+shuffle) filter pipeline.

The reader (`read_hdf5`) parses that subset generically: any number
of root-level datasets, contiguous or chunked layout, fixed-point /
IEEE-float / fixed-string datatypes, v1 attributes, object-header
continuations, multi-level chunk B-trees, gzip + shuffle filters
(inflated with zlib). Corrupt or out-of-scope input raises
``Hdf5Error`` (a ValueError), matching the repo codec fuzz contract.

The writer (`write_hdf5`) emits the same subset (uncompressed or
gzip) so the engine can produce feature stores a pytables user reads
back, and so the reader is exercised end-to-end — the container has
no HDF5 library to cross-check against, which is documented in
SURVEY/COVERAGE terms as a layout-level (not library-level) parity.

All structure layouts follow the public HDF5 File Format
Specification v1 (superblock 0, object header 1, B-tree v1).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"


class Hdf5Error(ValueError):
    """Corrupt or unsupported HDF5 input."""


# --------------------------------------------------------------- writer

class _Buf:
    def __init__(self) -> None:
        self.b = bytearray()

    def tell(self) -> int:
        return len(self.b)

    def write(self, data: bytes) -> int:
        off = len(self.b)
        self.b += data
        return off

    def pad8(self) -> None:
        self.b += b"\x00" * (-len(self.b) % 8)


def _dt_message(dtype: np.dtype) -> bytes:
    """Datatype message body for the supported classes."""
    if dtype == np.float64 or dtype == np.float32:
        f64 = dtype == np.float64
        # class 1 (float) version 1; bit field: LE, mantissa norm =
        # implied-msb (2), sign location 63/31
        bits = bytes([0x20, 63 if f64 else 31, 0])
        props = struct.pack(
            "<HHBBBBI",
            0, 64 if f64 else 32,            # bit offset / precision
            52 if f64 else 23, 11 if f64 else 8,   # exponent loc/size
            0, 52 if f64 else 23,            # mantissa loc/size
            1023 if f64 else 127,            # exponent bias
        )
        return bytes([0x11]) + bits + struct.pack("<I", dtype.itemsize) + props
    if dtype.kind == "S":
        # class 3 (fixed string) version 1; null-terminated, ASCII
        return bytes([0x13, 0, 0, 0]) + struct.pack("<I", dtype.itemsize)
    if dtype == np.int64:
        # class 0 (fixed-point) version 1; LE, signed (bit 3)
        return (bytes([0x10, 0x08, 0, 0]) + struct.pack("<I", 8)
                + struct.pack("<HH", 0, 64))
    raise Hdf5Error(f"unsupported dtype for HDF5 writer: {dtype}")


def _ds_message(shape: tuple, unlimited_first: bool) -> bytes:
    """Dataspace message body, version 1 (maxdims always stored for
    rank > 0 — pytables EArrays have an unlimited first dim)."""
    rank = len(shape)
    if rank == 0:
        return struct.pack("<BBBB4x", 1, 0, 0, 0)
    body = struct.pack("<BBBB4x", 1, rank, 1, 0)
    body += b"".join(struct.pack("<Q", d) for d in shape)
    maxd = list(shape)
    if unlimited_first:
        maxd[0] = UNDEF
    body += b"".join(struct.pack("<Q", d) for d in maxd)
    return body


def _msg(mtype: int, body: bytes) -> bytes:
    body = body + b"\x00" * (-len(body) % 8)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _attr_message(name: str, value) -> bytes:
    """Attribute message body, version 1 (name/datatype/dataspace each
    padded to 8; scalar dataspace)."""
    if isinstance(value, str):
        raw = value.encode()
        size = max(len(raw), 1)  # S0 is not a dtype; pad "" to one NUL
        dt = _dt_message(np.dtype(f"S{size}"))
        data = raw.ljust(size, b"\x00")
    elif isinstance(value, (int, np.integer)):
        dt = _dt_message(np.dtype(np.int64))
        data = struct.pack("<q", int(value))
    else:
        raise Hdf5Error(f"unsupported attribute type: {type(value)}")
    ds = _ds_message((), False)
    nm = name.encode() + b"\x00"

    def p8(x: bytes) -> bytes:
        return x + b"\x00" * (-len(x) % 8)

    head = struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
    return head + p8(nm) + p8(dt) + p8(ds) + data


# libhdf5 reads v1 B-tree / symbol nodes at their FULL-capacity size
# (derived from the superblock K values), not at used-entries size —
# nodes must be written padded to capacity or a read near EOF fails.
_GROUP_LEAF_K = 4      # superblock "group leaf node k" -> SNOD cap 2K
_GROUP_INT_K = 16      # superblock "group internal node k"
_CHUNK_K = 32          # libhdf5 default indexed-storage K (v0 superblock)


def _chunk_btree(buf: _Buf, chunks: list, rank: int, crows: int) -> int:
    """v1 chunk B-tree (node type 1), libhdf5-compatible: nodes padded
    to full 2K capacity, strictly-increasing keys with a past-the-end
    trailing key, sibling links, and an internal level when the chunk
    count exceeds one leaf. ``chunks`` is a list of (offsets tuple
    incl. trailing 0, nbytes, address); ``crows`` is the chunk's
    first-dimension size (for the past-the-end key)."""
    rank1 = rank + 1
    key_size = 8 + 8 * rank1
    cap = 2 * _CHUNK_K
    node_size = 24 + (cap + 1) * key_size + cap * 8
    end_key = (0, 0, (chunks[-1][0][0] + crows,) + (0,) * rank)
    groups = [chunks[i:i + cap] for i in range(0, len(chunks), cap)]
    if len(groups) > cap:
        raise Hdf5Error(
            f"{len(chunks)} chunks exceed the 2-level B-tree capacity "
            f"({cap * cap}); raise chunk_rows"
        )

    def key_bytes(nbytes: int, fmask: int, offs: tuple) -> bytes:
        return struct.pack("<II", nbytes, fmask) + b"".join(
            struct.pack("<Q", o) for o in offs
        )

    buf.pad8()
    base = buf.tell()
    leaf_addrs = [base + i * node_size for i in range(len(groups))]
    for gi, grp in enumerate(groups):
        left = leaf_addrs[gi - 1] if gi > 0 else UNDEF
        right = leaf_addrs[gi + 1] if gi < len(groups) - 1 else UNDEF
        body = bytearray()
        body += b"TREE" + struct.pack("<BBH", 1, 0, len(grp))
        body += struct.pack("<QQ", left, right)
        for offs, nbytes, caddr in grp:
            body += key_bytes(nbytes, 0, offs)
            body += struct.pack("<Q", caddr)
        if gi < len(groups) - 1:
            nxt = groups[gi + 1][0]
            body += key_bytes(nxt[1], 0, nxt[0])
        else:
            body += key_bytes(*end_key)
        body += b"\x00" * (node_size - len(body))
        buf.write(bytes(body))
    if len(groups) == 1:
        return leaf_addrs[0]
    # internal node (level 1): key_i = first chunk key of child i
    buf.pad8()
    root = buf.tell()
    body = bytearray()
    body += b"TREE" + struct.pack("<BBH", 1, 1, len(groups))
    body += struct.pack("<QQ", UNDEF, UNDEF)
    for gi, grp in enumerate(groups):
        body += key_bytes(grp[0][1], 0, grp[0][0])
        body += struct.pack("<Q", leaf_addrs[gi])
    body += key_bytes(*end_key)
    body += b"\x00" * (node_size - len(body))
    buf.write(bytes(body))
    return root


def write_hdf5(datasets: "dict[str, np.ndarray]",
               attrs: "dict[str, dict] | None" = None,
               chunk_rows: int = 1024,
               compress: bool = False) -> bytes:
    """Serialize root-level datasets into an HDF5 byte stream in the
    pytables-EArray layout (chunked, unlimited first dimension).

    datasets: name -> 1-D or 2-D array (float32/64, int64, or bytes 'S');
    attrs: per-dataset scalar attributes (str or int), e.g.
    {'vec': {'vec_dim': 168, 'vec_type': 'SSD'}}."""
    attrs = attrs or {}
    buf = _Buf()
    buf.write(b"\x00" * 96)  # superblock placeholder (fixed size)

    # ---- local heap with dataset names
    names = sorted(datasets)  # SNOD entries must be name-ordered
    heap_data = bytearray(b"\x00" * 8)  # offset 0: empty string
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        raw = n.encode() + b"\x00"
        heap_data += raw + b"\x00" * (-len(raw) % 8)
    buf.pad8()
    heap_seg_addr = buf.tell() + 32
    heap_addr = buf.write(
        b"HEAP" + struct.pack("<B3x", 0)
        + struct.pack("<QQQ", len(heap_data), UNDEF, heap_seg_addr)
    )
    buf.write(bytes(heap_data))

    # ---- datasets: raw chunks + object headers
    oh_addrs = {}
    for n in names:
        arr = np.ascontiguousarray(datasets[n])
        if arr.ndim not in (1, 2):
            raise Hdf5Error("writer supports 1-D/2-D datasets")
        shape = arr.shape
        rank = arr.ndim
        # declared chunk first-dim and the written chunk blocks must
        # agree, also when the dataset is smaller than chunk_rows
        crows = min(chunk_rows, shape[0]) or 1
        chunks = []
        for r0 in range(0, max(shape[0], 1), crows):
            rows = arr[r0:r0 + crows]
            if rows.shape[0] == 0:
                continue
            # edge chunks are stored full-size (zero padded)
            full = np.zeros((crows,) + shape[1:], dtype=arr.dtype)
            full[: rows.shape[0]] = rows
            raw = full.tobytes()
            if compress:
                raw = zlib.compress(raw, 6)
            buf.pad8()
            caddr = buf.write(raw)
            offs = (r0,) + (0,) * (rank - 1) + (0,)
            chunks.append((offs, len(raw), caddr))
        if chunks:
            bt_addr = _chunk_btree(buf, chunks, rank, crows)
        else:
            bt_addr = UNDEF

        msgs = []
        msgs.append(_msg(0x0001, _ds_message(shape, True)))
        msgs.append(_msg(0x0003, _dt_message(arr.dtype)))
        # fill value v2, undefined (body multiple of 8 via _msg pad)
        msgs.append(_msg(0x0005, struct.pack("<BBBB", 2, 2, 0, 0)))
        if compress:
            # filter pipeline v1: deflate (id 1), 1 client value (level)
            filt = struct.pack("<BB6x", 1, 1)
            filt += struct.pack("<HHHH", 1, 8, 1, 1) + b"deflate\x00"
            filt += struct.pack("<II", 6, 0)  # level + even-count pad
            msgs.append(_msg(0x000B, filt))
        layout = struct.pack("<BBB", 3, 2, rank + 1)
        layout += struct.pack("<Q", bt_addr)
        dims = list(shape[1:]) + [arr.itemsize]
        layout += struct.pack("<I", crows)
        layout += b"".join(struct.pack("<I", d) for d in dims)
        msgs.append(_msg(0x0008, layout))
        for an, av in attrs.get(n, {}).items():
            msgs.append(_msg(0x000C, _attr_message(an, av)))
        mblock = b"".join(msgs)
        buf.pad8()
        oh_addrs[n] = buf.write(
            struct.pack("<BxHII4x", 1, len(msgs), 1, len(mblock)) + mblock
        )

    # ---- SNOD with one entry per dataset, padded to 2K capacity
    # (libhdf5 reads the full-capacity node size)
    if len(names) > 2 * _GROUP_LEAF_K:
        raise Hdf5Error(
            f"{len(names)} root datasets exceed the symbol-node "
            f"capacity ({2 * _GROUP_LEAF_K})"
        )
    buf.pad8()
    snod_addr = buf.tell()
    snod = bytearray(b"SNOD" + struct.pack("<BBH", 1, 0, len(names)))
    for n in names:
        snod += struct.pack("<QQII16x", name_off[n], oh_addrs[n], 0, 0)
    snod += b"\x00" * (8 + 2 * _GROUP_LEAF_K * 40 - len(snod))
    buf.write(bytes(snod))

    # ---- group B-tree (node type 0) pointing at the SNOD, padded to
    # the internal-K node size
    buf.pad8()
    gnode = bytearray(
        b"TREE" + struct.pack("<BBH", 0, 0, 1)
        + struct.pack("<QQ", UNDEF, UNDEF)
        + struct.pack("<QQQ", 0, snod_addr,
                      name_off[names[-1]] if names else 0)
    )
    gnode += b"\x00" * (24 + (2 * _GROUP_INT_K + 1) * 8
                        + 2 * _GROUP_INT_K * 8 - len(gnode))
    btree_addr = buf.write(bytes(gnode))

    # ---- root group object header (symbol table message)
    buf.pad8()
    st_msg = _msg(0x0011, struct.pack("<QQ", btree_addr, heap_addr))
    root_oh = buf.write(
        struct.pack("<BxHII4x", 1, 1, 1, len(st_msg)) + st_msg
    )

    # ---- superblock (version 0)
    sb = _SIG + struct.pack(
        "<BBBBBBBBHHI", 0, 0, 0, 0, 0, 8, 8, 0, 4, 16, 0
    )
    sb += struct.pack("<QQQQ", 0, UNDEF, len(buf.b), UNDEF)
    sb += struct.pack("<QQII", 0, root_oh, 1, 0)
    sb += struct.pack("<QQ", btree_addr, heap_addr)
    buf.b[: len(sb)] = sb
    return bytes(buf.b)


# --------------------------------------------------------------- reader

class _Rd:
    def __init__(self, data: bytes):
        self.d = data

    def u(self, off: int, n: int) -> int:
        if off < 0 or off + n > len(self.d):
            raise Hdf5Error("offset beyond end of file")
        return int.from_bytes(self.d[off:off + n], "little")

    def bytes(self, off: int, n: int) -> bytes:
        if off < 0 or off + n > len(self.d):
            raise Hdf5Error("offset beyond end of file")
        return self.d[off:off + n]


def _parse_datatype(b: bytes):
    """-> (numpy dtype, class) for fixed-point / float / fixed-string."""
    if len(b) < 8:
        raise Hdf5Error("short datatype message")
    cls = b[0] & 0x0F
    size = struct.unpack_from("<I", b, 4)[0]
    if cls == 0:  # fixed-point
        signed = bool(b[1] & 0x08)
        if size not in (1, 2, 4, 8):
            raise Hdf5Error(f"unsupported int size {size}")
        return np.dtype(f"<{'i' if signed else 'u'}{size}"), cls
    if cls == 1:  # float
        if size not in (4, 8):
            raise Hdf5Error(f"unsupported float size {size}")
        return np.dtype(f"<f{size}"), cls
    if cls == 3:  # fixed string
        # bound BEFORE np.dtype: a corrupted 32-bit size overflows
        # numpy's C itemsize to a NEGATIVE value, which then slips past
        # every `len(raw) < n * itemsize` guard and segfaults frombuffer
        # element access (observed under single-byte fuzzing)
        if size == 0 or size > (1 << 20):
            raise Hdf5Error(f"implausible string size {size}")
        return np.dtype(f"S{size}"), cls
    raise Hdf5Error(f"unsupported datatype class {cls}")


def _parse_dataspace(b: bytes) -> tuple:
    if len(b) < 2:
        raise Hdf5Error("short dataspace message")
    version, rank = b[0], b[1]
    if version == 1:
        off = 8
    elif version == 2:
        off = 4
    else:
        raise Hdf5Error(f"unsupported dataspace version {version}")
    if len(b) < off + 8 * rank:
        raise Hdf5Error("dataspace dims beyond message")
    return tuple(struct.unpack_from("<Q", b, off + 8 * i)[0]
                 for i in range(rank))


def _collect_messages(rd: _Rd, oh_addr: int) -> list:
    """v1 object header -> [(type, body bytes)], following
    continuation messages."""
    version = rd.u(oh_addr, 1)
    if version != 1:
        raise Hdf5Error(f"unsupported object header version {version}")
    nmsgs = rd.u(oh_addr + 2, 2)
    hsize = rd.u(oh_addr + 8, 4)
    blocks = [(oh_addr + 16, hsize)]
    seen = {oh_addr + 16}
    msgs = []
    while blocks and len(msgs) < nmsgs:
        pos, remaining = blocks.pop(0)
        while remaining >= 8 and len(msgs) < nmsgs:
            mtype = rd.u(pos, 2)
            msize = rd.u(pos + 2, 2)
            body = rd.bytes(pos + 8, msize)
            if mtype == 0x0010:  # continuation
                if msize < 16:
                    raise Hdf5Error("short continuation message")
                coff, clen = struct.unpack_from("<QQ", body)
                if coff in seen:
                    raise Hdf5Error("continuation cycle")
                seen.add(coff)
                blocks.append((coff, clen))
            elif mtype != 0x0000:  # skip NIL
                msgs.append((mtype, body))
            pos += 8 + msize
            remaining -= 8 + msize
    return msgs


def _parse_attr(body: bytes):
    if len(body) < 8:
        raise Hdf5Error("short attribute message")
    version = body[0]
    if version != 1:
        return None  # newer attr version: skip, don't fail the file
    name_sz, dt_sz, ds_sz = struct.unpack_from("<HHH", body, 2)

    def pad(x: int) -> int:
        return x + (-x % 8)

    pos = 8
    name = body[pos:pos + name_sz].split(b"\x00")[0].decode("utf-8",
                                                            "replace")
    pos += pad(name_sz)
    try:
        dtype, cls = _parse_datatype(body[pos:pos + dt_sz])
    except Hdf5Error:
        return None  # vlen/compound attr: skip
    pos += pad(dt_sz)
    shape = _parse_dataspace(body[pos:pos + ds_sz])
    pos += pad(ds_sz)
    n = int(np.prod(shape, dtype=np.float64)) if shape else 1
    if n < 0 or n * dtype.itemsize > len(body):
        raise Hdf5Error("attribute dataspace larger than message")
    raw = body[pos:pos + n * dtype.itemsize]
    if len(raw) < n * dtype.itemsize:
        raise Hdf5Error("attribute data truncated")
    val = np.frombuffer(raw, dtype=dtype, count=n)
    if cls == 3:
        out = [v.split(b"\x00")[0].decode("utf-8", "replace") for v in val]
        return name, (out[0] if not shape else out)
    out = val.tolist()
    return name, (out[0] if not shape else out)


def _walk_chunk_btree(rd: _Rd, addr: int, rank1: int, out: list,
                      seen: "set | None" = None) -> None:
    """Collect (offsets, nbytes, filter_mask, address) from a v1 chunk
    B-tree (recursing through internal levels)."""
    if addr == UNDEF:
        return
    seen = set() if seen is None else seen
    if addr in seen:
        raise Hdf5Error("chunk B-tree cycle")
    seen.add(addr)
    if rd.bytes(addr, 4) != b"TREE":
        raise Hdf5Error("bad chunk B-tree signature")
    node_type = rd.u(addr + 4, 1)
    level = rd.u(addr + 5, 1)
    used = rd.u(addr + 6, 2)
    if node_type != 1:
        raise Hdf5Error("group node in chunk B-tree")
    pos = addr + 24
    key_sz = 8 + 8 * rank1
    for _ in range(used):
        nbytes = rd.u(pos, 4)
        fmask = rd.u(pos + 4, 4)
        offs = tuple(rd.u(pos + 8 + 8 * i, 8) for i in range(rank1))
        child = rd.u(pos + key_sz, 8)
        if level == 0:
            out.append((offs, nbytes, fmask, child))
        else:
            _walk_chunk_btree(rd, child, rank1, out, seen)
        pos += key_sz + 8


_DEFLATE, _SHUFFLE, _FLETCHER32 = 1, 2, 3


def _parse_filters(body: bytes) -> list:
    """Filter pipeline message -> [filter_id] in application order."""
    if len(body) < 2:
        raise Hdf5Error("short filter pipeline message")
    version, nfilt = body[0], body[1]
    filters = []
    if version == 1:
        pos = 8
        for _ in range(nfilt):
            fid, name_len, _flags, ncv = struct.unpack_from("<HHHH",
                                                            body, pos)
            pos += 8 + name_len + (-name_len % 8)
            pos += 4 * ncv + (4 if ncv % 2 else 0)
            filters.append(fid)
    elif version == 2:
        pos = 2
        for _ in range(nfilt):
            fid, name_len, _flags, ncv = struct.unpack_from("<HHHH",
                                                            body, pos)
            pos += 8 + name_len + 4 * ncv
            filters.append(fid)
    else:
        raise Hdf5Error(f"unsupported filter pipeline version {version}")
    return filters


def _decode_chunk(raw: bytes, filters: list, fmask: int,
                  itemsize: int) -> bytes:
    # filters are applied in reverse order on read; bit i of the mask
    # set means filter i was skipped for this chunk
    for i in range(len(filters) - 1, -1, -1):
        if fmask & (1 << i):
            continue
        fid = filters[i]
        if fid == _DEFLATE:
            try:
                raw = zlib.decompress(raw)
            except zlib.error as e:
                raise Hdf5Error(f"bad deflate chunk: {e}") from None
        elif fid == _SHUFFLE:
            a = np.frombuffer(raw, dtype=np.uint8)
            if len(a) % itemsize:
                raise Hdf5Error("shuffle chunk not a multiple of itemsize")
            raw = a.reshape(itemsize, -1).T.tobytes()
        elif fid == _FLETCHER32:
            raw = raw[:-4]  # checksum trailer (not verified)
        else:
            raise Hdf5Error(f"unsupported HDF5 filter id {fid}")
    return raw


def _read_dataset(rd: _Rd, oh_addr: int):
    """-> (array, attrs dict) for one dataset object header."""
    msgs = _collect_messages(rd, oh_addr)
    shape = dtype = None
    layout = None
    filters: list = []
    attrs: dict = {}
    for mtype, body in msgs:
        if mtype == 0x0001:
            shape = _parse_dataspace(body)
        elif mtype == 0x0003:
            dtype, _cls = _parse_datatype(body)
        elif mtype == 0x0008:
            layout = body
        elif mtype == 0x000B:
            filters = _parse_filters(body)
        elif mtype == 0x000C:
            parsed = _parse_attr(body)
            if parsed:
                attrs[parsed[0]] = parsed[1]
    if shape is None or dtype is None or layout is None:
        raise Hdf5Error("dataset missing dataspace/datatype/layout")
    # plausibility cap: a dense dataset (chunked-EArray scope) cannot
    # decompress to orders of magnitude more than the file holds — a
    # corrupted dataspace must not drive a huge allocation
    total = int(np.prod(shape, dtype=np.float64)) * dtype.itemsize
    if total > 1024 * len(rd.d) + (1 << 20):
        raise Hdf5Error("dataspace implausibly large for file size")
    version = layout[0]
    if version != 3:
        raise Hdf5Error(f"unsupported data layout version {version}")
    lclass = layout[1]
    arr = np.zeros(shape, dtype=dtype)
    if lclass == 1:  # contiguous
        addr, size = struct.unpack_from("<QQ", layout, 2)
        need = int(arr.nbytes)
        if addr == UNDEF or need == 0:
            return arr, attrs
        if size < need:
            raise Hdf5Error("contiguous data smaller than dataspace")
        flat = np.frombuffer(rd.bytes(addr, need), dtype=dtype)
        return flat.reshape(shape).copy(), attrs
    if lclass != 2:
        raise Hdf5Error(f"unsupported data layout class {lclass}")
    rank1 = layout[2]  # dataset rank + 1
    if rank1 != len(shape) + 1:
        raise Hdf5Error("chunk rank does not match dataspace rank")
    bt_addr = struct.unpack_from("<Q", layout, 3)[0]
    chunk_dims = struct.unpack_from(f"<{rank1}I", layout, 11)
    if chunk_dims[-1] != dtype.itemsize:
        raise Hdf5Error("chunk element size does not match datatype")
    cshape = chunk_dims[:-1]
    chunks: list = []
    _walk_chunk_btree(rd, bt_addr, rank1, chunks)
    for offs, nbytes, fmask, caddr in chunks:
        raw = _decode_chunk(bytes(rd.bytes(caddr, nbytes)), filters,
                            fmask, dtype.itemsize)
        want = int(np.prod(cshape, dtype=np.int64)) * dtype.itemsize
        if len(raw) < want:
            raise Hdf5Error("chunk shorter than chunk shape")
        block = np.frombuffer(raw[:want], dtype=dtype).reshape(cshape)
        sel_dst, sel_src = [], []
        for d, (o, c, s) in enumerate(zip(offs[:-1], cshape, shape)):
            if o >= s:
                sel_dst = None
                break
            n = min(c, s - o)
            sel_dst.append(slice(o, o + n))
            sel_src.append(slice(0, n))
        if sel_dst is None:
            continue  # chunk entirely past the dataspace: ignore
        arr[tuple(sel_dst)] = block[tuple(sel_src)]
    return arr, attrs


def read_hdf5(data: bytes) -> "dict[str, tuple[np.ndarray, dict]]":
    """Parse an HDF5 byte stream -> {dataset name: (array, attrs)} for
    every dataset directly under the root group.

    Corrupt input raises ``Hdf5Error`` (a ``ValueError``) — never
    ``struct.error``/``IndexError`` from truncated internal structures
    (required by the per-file quarantine path in sources/hdf5.py)."""
    try:
        return _read_hdf5(data)
    except Hdf5Error:
        raise
    except (struct.error, IndexError, ValueError, OverflowError) as e:
        raise Hdf5Error(f"corrupt HDF5 stream: {e}") from None


def _read_hdf5(data: bytes) -> "dict[str, tuple[np.ndarray, dict]]":
    if len(data) < 96 or data[:8] != _SIG:
        raise Hdf5Error("not an HDF5 stream")
    rd = _Rd(data)
    sb_version = rd.u(8, 1)
    if sb_version not in (0, 1):
        raise Hdf5Error(f"unsupported superblock version {sb_version}")
    if rd.u(13, 1) != 8 or rd.u(14, 1) != 8:
        raise Hdf5Error("only 8-byte offsets/lengths supported")
    # root symbol table entry: after 24-byte prefix + 4 addresses
    # (+ 4 bytes indexed-storage-k for version 1)
    entry = 24 + 32 + (4 if sb_version == 1 else 0)
    root_oh = rd.u(entry + 8, 8)
    # group structure from the root header's symbol table message
    btree_addr = heap_addr = UNDEF
    for mtype, body in _collect_messages(rd, root_oh):
        if mtype == 0x0011:
            btree_addr, heap_addr = struct.unpack_from("<QQ", body)
    if btree_addr == UNDEF or heap_addr == UNDEF:
        raise Hdf5Error("root group has no symbol table")
    if rd.bytes(heap_addr, 4) != b"HEAP":
        raise Hdf5Error("bad local heap signature")
    heap_seg = rd.u(heap_addr + 24, 8)

    def heap_str(off: int) -> str:
        end = data.find(b"\x00", heap_seg + off)
        if end < 0:
            raise Hdf5Error("unterminated heap string")
        return data[heap_seg + off:end].decode("utf-8", "replace")

    out: dict = {}
    seen_nodes: set = set()

    def walk_group(addr: int) -> None:
        if addr in seen_nodes:
            raise Hdf5Error("group B-tree cycle")
        seen_nodes.add(addr)
        sig = rd.bytes(addr, 4)
        if sig == b"TREE":
            node_type = rd.u(addr + 4, 1)
            if node_type != 0:
                raise Hdf5Error("chunk node in group B-tree")
            used = rd.u(addr + 6, 2)
            pos = addr + 24
            for _ in range(used):
                child = rd.u(pos + 8, 8)
                walk_group(child)
                pos += 16
        elif sig == b"SNOD":
            nsyms = rd.u(addr + 6, 2)
            pos = addr + 8
            for _ in range(nsyms):
                name_off = rd.u(pos, 8)
                oh = rd.u(pos + 8, 8)
                out[heap_str(name_off)] = _read_dataset(rd, oh)
                pos += 40
        else:
            raise Hdf5Error("bad group node signature")

    walk_group(btree_addr)
    return out
