"""Minimal PLY point-cloud IO (numpy, clean-room).

The reference vendors the ``plyfile`` package
(/root/reference/pretrain/data_preprocess/scannet_pair/plyfile.py) and reads
``x y z red green blue label`` vertex properties
(/root/reference/downstream/semseg/lib/dataset.py:180-188).  This module
covers that surface: binary little-endian / ascii vertex elements with
scalar properties, ignoring face elements.
"""
from __future__ import annotations

import numpy as np

_PLY_TYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def read_ply(path: str) -> dict[str, np.ndarray]:
    """Read the vertex element into {property_name: 1-D array}."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype)])
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unexpected EOF in header")
            tokens = line.strip().split()
            if not tokens:
                continue
            key = tokens[0]
            if key == b"format":
                fmt = tokens[1].decode()
            elif key == b"element":
                elements.append([tokens[1].decode(), int(tokens[2]), []])
            elif key == b"property":
                if tokens[1] == b"list":
                    elements[-1][2].append(
                        (tokens[4].decode(), "list", tokens[2].decode(), tokens[3].decode())
                    )
                else:
                    elements[-1][2].append(
                        (tokens[2].decode(), _PLY_TYPES[tokens[1].decode()])
                    )
            elif key == b"end_header":
                break

        out = {}
        for name, count, props in elements:
            has_list = any(len(p) == 4 for p in props)
            if name == "vertex" and not has_list:
                if fmt == "ascii":
                    data = np.loadtxt(
                        [f.readline() for _ in range(count)], ndmin=2
                    )
                    for i, (pname, _) in enumerate(props):
                        out[pname] = data[:, i]
                else:
                    endian = "<" if "little" in fmt else ">"
                    dt = np.dtype([(p, endian + t) for p, t in props])
                    arr = np.frombuffer(f.read(dt.itemsize * count), dtype=dt)
                    for pname, _ in props:
                        out[pname] = np.array(arr[pname])
            else:
                # skip non-vertex / list elements (faces)
                if fmt == "ascii":
                    for _ in range(count):
                        f.readline()
                else:
                    if has_list:
                        endian = "<" if "little" in fmt else ">"
                        for _ in range(count):
                            for p in props:
                                if len(p) == 4:
                                    cnt_t = np.dtype(endian + _PLY_TYPES[p[2]])
                                    n = int(
                                        np.frombuffer(f.read(cnt_t.itemsize), cnt_t)[0]
                                    )
                                    item_t = np.dtype(endian + _PLY_TYPES[p[3]])
                                    f.read(item_t.itemsize * n)
                                else:
                                    f.read(np.dtype(endian + p[1]).itemsize)
                    else:
                        endian = "<" if "little" in fmt else ">"
                        dt = np.dtype([(p, endian + t) for p, t in props])
                        f.read(dt.itemsize * count)
        return out


def read_ply_xyzrgbl(path: str):
    """(coords[N,3] f32, colors[N,3] f32, labels[N] i32); labels default 0."""
    v = read_ply(path)
    coords = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32)
    if "red" in v:
        colors = np.stack([v["red"], v["green"], v["blue"]], 1).astype(np.float32)
    else:
        colors = np.zeros_like(coords)
    labels = v.get("label", np.zeros(len(coords))).astype(np.int32)
    return coords, colors, labels


def save_ply(
    path: str,
    coords: np.ndarray,
    colors: np.ndarray | None = None,
    labels: np.ndarray | None = None,
    binary: bool = True,
):
    """Write x y z [red green blue] [label] vertices."""
    n = len(coords)
    props = [("x", "f4"), ("y", "f4"), ("z", "f4")]
    cols = [np.asarray(coords, dtype=np.float32)]
    if colors is not None:
        props += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
        cols.append(np.asarray(colors).astype(np.uint8))
    if labels is not None:
        props += [("label", "i4")]
        cols.append(np.asarray(labels).astype(np.int32)[:, None])

    names = {"f4": "float", "u1": "uchar", "i4": "int"}
    header = ["ply"]
    header.append(
        "format binary_little_endian 1.0" if binary else "format ascii 1.0"
    )
    header.append(f"element vertex {n}")
    header += [f"property {names[t]} {p}" for p, t in props]
    header.append("end_header")

    dt = np.dtype([(p, "<" + t) for p, t in props])
    rec = np.empty(n, dtype=dt)
    flat = np.concatenate([c.reshape(n, -1).astype(np.float64) for c in cols], 1)
    for i, (p, t) in enumerate(props):
        rec[p] = flat[:, i].astype(dt[p])

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if binary:
            f.write(rec.tobytes())
        else:
            np.savetxt(f, flat, fmt="%g")
