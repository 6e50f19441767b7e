#!/usr/bin/env python3
"""Independent NetCDF-3 classic (CDF-1) reader — cross-validates
graft.ops.Sinks.writeNetcdf against a second implementation of the public
spec (no netCDF library involved; pure struct parsing).

Usage: python3 tools/nc3check.py <file.nc>
Prints dims, attributes, variables, and a value summary; exits non-zero on
any structural violation (bad magic, misaligned sections, offset overlap,
trailing bytes).
"""
import struct
import sys

NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
TYPES = {1: ("byte", 1, "b"), 2: ("char", 1, "s"), 3: ("short", 2, "h"),
         4: ("int", 4, "i"), 5: ("float", 4, "f"), 6: ("double", 8, "d")}


class R:
    def __init__(self, b):
        self.b, self.i = b, 0

    def u32(self):
        v = struct.unpack(">i", self.b[self.i:self.i + 4])[0]
        self.i += 4
        return v

    def raw(self, n):
        v = self.b[self.i:self.i + n]
        self.i += n
        return v

    def name(self):
        n = self.u32()
        v = self.raw(n).decode()
        pad = (4 - n % 4) % 4
        assert self.raw(pad) == b"\x00" * pad, "name padding not zeroed"
        return v


def read_atts(r):
    tag = r.u32()
    n = r.u32()
    if tag == 0:
        assert n == 0, "ABSENT att list must be (0, 0)"
        return {}
    assert tag == NC_ATTRIBUTE, f"bad att tag {tag:#x}"
    out = {}
    for _ in range(n):
        nm = r.name()
        t = r.u32()
        nel = r.u32()
        tn, sz, fmt = TYPES[t]
        raw = r.raw(nel * sz)
        pad = (4 - (nel * sz) % 4) % 4
        assert r.raw(pad) == b"\x00" * pad, "att padding not zeroed"
        if t == 2:
            out[nm] = raw.decode()
        else:
            out[nm] = struct.unpack(f">{nel}{fmt}", raw)
    return out


def main(path):
    with open(path, "rb") as f:
        b = f.read()
    r = R(b)
    assert r.raw(3) == b"CDF", "bad magic"
    assert r.raw(1) == b"\x01", "not CDF-1"
    numrecs = r.u32()
    assert r.u32() == NC_DIMENSION, "missing dim list"
    dims = [(r.name(), r.u32()) for _ in range(r.u32())]
    gatts = read_atts(r)
    assert r.u32() == NC_VARIABLE, "missing var list"
    nvars = r.u32()
    vars_ = []
    for _ in range(nvars):
        nm = r.name()
        dimids = [r.u32() for _ in range(r.u32())]
        atts = read_atts(r)
        t = r.u32()
        vsize = r.u32()
        begin = r.u32()
        vars_.append((nm, dimids, atts, t, vsize, begin))
    header_end = r.i

    print(f"numrecs={numrecs}")
    print("dims:", dims)
    print("gatts:", gatts)
    off = header_end
    for nm, dimids, atts, t, vsize, begin in vars_:
        tn, sz, fmt = TYPES[t]
        nel = 1
        for d in dimids:
            nel *= dims[d][1]
        expect = (nel * sz + 3) & ~3
        assert vsize == expect, f"{nm}: vsize {vsize} != padded {expect}"
        assert begin == off, f"{nm}: begin {begin} != expected {off}"
        off += vsize
        raw = b[begin:begin + nel * sz]
        if t == 2:
            vals = raw.decode(errors="replace")
            print(f"var {nm}{[dims[d][0] for d in dimids]} char: {vals!r}")
        else:
            vals = struct.unpack(f">{nel}{fmt}", raw)
            import math
            finite = [v for v in vals if not math.isnan(v)]
            print(f"var {nm}{[dims[d][0] for d in dimids]} {tn} n={nel} "
                  f"atts={atts} head={vals[:6]} "
                  f"finite={len(finite)}/{nel}")
    assert off == len(b), f"trailing bytes: file {len(b)} != data end {off}"
    print("OK")


if __name__ == "__main__":
    main(sys.argv[1])
