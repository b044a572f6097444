"""SUN RGB-D official-release extraction (Python port of the MATLAB stage).

Re-implements /root/reference/downstream/votenet_det_new/lib/datasets/
sunrgbd/matlab/{extract_rgbd_data_v2.m, extract_rgbd_data_v1.m,
extract_split.m} with scipy.io.loadmat over the official release's
``SUNRGBDMeta3DBB_v2.mat`` / ``SUNRGBDMeta2DBB_v2.mat`` /
``SUNRGBDtoolbox/Metadata/SUNRGBDMeta.mat`` /
``SUNRGBDtoolbox/traintestSUNRGBD/allsplit.mat`` structures, producing the
``sunrgbd_trainval/{depth,image,calib,label,label_v1}`` layout plus the
train/val idx lists that ``tools/sunrgbd_data.py`` consumes.  With this
module the whole SUN RGB-D pipeline runs from the raw download with no
MATLAB.

The depth decode and unprojection mirror the SUNRGBD toolbox's
``read3dPoints.m`` / ``read_3d_pts_general.m`` (the official loader the
MATLAB scripts call): 3-bit-rotated uint16 depth PNGs, 8 m clamp, camera
frame with y forward / z up, then Rtilt to upright-depth coordinates.
"""
from __future__ import annotations

import os
import shutil

import numpy as np

MAX_DEPTH_M = 8.0
_STRIP = 16  # MATLAB scripts drop the absolute '/n/fs/sun3d/data/' prefix


# --------------------------------------------------------------- mat access

def _unwrap(x):
    """Collapse scipy.io.loadmat's nesting: 1x1 object/str arrays -> value."""
    while isinstance(x, np.ndarray) and x.dtype == object and x.size == 1:
        x = x.item()
    if isinstance(x, np.ndarray) and x.dtype.kind == "U" and x.size == 1:
        return str(x.item())
    if isinstance(x, np.str_):
        return str(x)
    return x


def _field(entry, name):
    """Struct field access tolerant of loadmat's record/object variants."""
    if isinstance(entry, np.void) or (
        isinstance(entry, np.ndarray) and entry.dtype.names
    ):
        return _unwrap(entry[name])
    return _unwrap(getattr(entry, name))


def _struct_list(meta):
    """A loadmat'd 1xN struct array -> list of per-image entries."""
    arr = np.atleast_1d(np.squeeze(np.asarray(meta)))
    return [arr[i] for i in range(arr.shape[0])]


def load_meta(mat_path: str, var: str | None = None):
    """Load a SUNRGBDMeta-style struct array from a .mat file.

    var: the variable name; default = the single non-private variable."""
    import scipy.io as sio

    d = sio.loadmat(mat_path)
    if var is None:
        names = [k for k in d if not k.startswith("__")]
        assert len(names) == 1, f"ambiguous variables {names} in {mat_path}"
        var = names[0]
    return _struct_list(d[var])


# ------------------------------------------------------------- depth decode

def read_sunrgbd_depth(png_path: str) -> np.ndarray:
    """uint16 depth PNG -> meters [H, W] (read3dPoints.m:4-7): the sensor
    packs depth rotated left by 3 bits; clamp at 8 m."""
    from PIL import Image

    raw = np.asarray(Image.open(png_path), dtype=np.uint16)
    depth = np.bitwise_or(raw >> 3, raw << 13).astype(np.float32) / 1000.0
    depth[depth > MAX_DEPTH_M] = MAX_DEPTH_M
    return depth


def read_3d_points(depth_m: np.ndarray, k: np.ndarray,
                   rgb: np.ndarray | None = None):
    """Unproject a metric depth map (read_3d_pts_general.m): camera frame is
    x right, y forward (depth), z up; pixel centers are 1-based like the
    MATLAB meshgrid; rows flatten column-major to match the toolbox's
    reshape order.  Returns (points3d [N,3] with NaN rows for zero depth,
    rgb [N,3] float 0..1 or None)."""
    h, w = depth_m.shape
    cx, cy = k[0, 2], k[1, 2]
    fx, fy = k[0, 0], k[1, 1]
    x, y = np.meshgrid(np.arange(1, w + 1), np.arange(1, h + 1))
    x3 = (x - cx) * depth_m / fx
    z3 = -(y - cy) * depth_m / fy
    pts = np.stack(
        [x3.ravel(order="F"), depth_m.ravel(order="F"), z3.ravel(order="F")],
        axis=1,
    )
    pts[depth_m.ravel(order="F") == 0] = np.nan
    if rgb is not None:
        rgb = (rgb.astype(np.float64) / 255.0).reshape(-1, 3, order="F") \
            if rgb.dtype != np.float64 else rgb.reshape(-1, 3, order="F")
    return pts, rgb


def _resolve(official_dir: str, path: str) -> str:
    """MATLAB: path(1:16) = ''; strcat(official_dir, path)."""
    return official_dir + str(path)[_STRIP:]


# ---------------------------------------------------------------- extractors

def extract_rgbd_data_v2(
    meta3d_path: str,
    meta2d_path: str,
    official_dir: str,
    out_dir: str,
    image_ids: list[int] | None = None,
    write_images: bool = True,
) -> list[int]:
    """extract_rgbd_data_v2.m: per image write
    depth/%06d.mat ('instance' = [N,6] upright-depth xyz + rgb),
    image/%06d.jpg, calib/%06d.txt (Rtilt then K, column-major rows),
    label/%06d.txt (v2 3D boxes + v2 2D boxes).

    image_ids are 1-based like the MATLAB loop.  Images whose files are
    missing are skipped (the .m wraps each in try/catch).  Returns the ids
    written."""
    import scipy.io as sio
    from PIL import Image

    meta3d = load_meta(meta3d_path)
    meta2d = load_meta(meta2d_path)
    dirs = {
        n: os.path.join(out_dir, n)
        for n in ("depth", "image", "calib", "label")
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    ids = image_ids or range(1, len(meta3d) + 1)
    done = []
    for image_id in ids:
        try:
            data = meta3d[image_id - 1]
            depth_path = _resolve(official_dir, _field(data, "depthpath"))
            rgb_path = _resolve(official_dir, _field(data, "rgbpath"))
            rtilt = np.asarray(_field(data, "Rtilt"), np.float64)
            k = np.asarray(_field(data, "K"), np.float64)

            depth = read_sunrgbd_depth(depth_path)
            rgb_im = np.asarray(Image.open(rgb_path).convert("RGB"))
            pts, rgb = read_3d_points(depth, k, rgb_im)
            pts = (rtilt @ pts.T).T  # read3dPoints.m:9 -> upright depth
            valid = ~np.isnan(pts[:, 0])
            points3d_rgb = np.concatenate([pts[valid], rgb[valid]], axis=1)

            sio.savemat(
                os.path.join(dirs["depth"], "%06d.mat" % image_id),
                {"instance": points3d_rgb},
            )
            if write_images:
                shutil.copyfile(
                    rgb_path, os.path.join(dirs["image"], "%06d.jpg" % image_id)
                )
            _write_calib(
                os.path.join(dirs["calib"], "%06d.txt" % image_id), rtilt, k
            )
            _write_label(
                os.path.join(dirs["label"], "%06d.txt" % image_id),
                data, meta2d[image_id - 1],
            )
            done.append(image_id)
        except (OSError, ValueError, KeyError, IndexError):
            continue  # parfor body is try/catch'd in the .m
    return done


def extract_rgbd_data_v1(
    meta_path: str, out_dir: str, image_ids: list[int] | None = None
) -> list[int]:
    """extract_rgbd_data_v1.m: only the label_v1/%06d.txt stage (v1 boxes
    live on the same struct, 2D and 3D)."""
    meta = load_meta(meta_path)
    label_dir = os.path.join(out_dir, "label_v1")
    os.makedirs(label_dir, exist_ok=True)
    ids = image_ids or range(1, len(meta) + 1)
    done = []
    for image_id in ids:
        try:
            data = meta[image_id - 1]
            _write_label(
                os.path.join(label_dir, "%06d.txt" % image_id), data, data
            )
            done.append(image_id)
        except (OSError, ValueError, KeyError, IndexError):
            continue
    return done


def _write_calib(path: str, rtilt: np.ndarray, k: np.ndarray):
    # dlmwrite(Rtilt(:)') flattens column-major; read back with order='F'
    # (sunrgbd_utils.py:92)
    with open(path, "w") as f:
        f.write(" ".join(repr(float(v)) for v in rtilt.ravel(order="F")) + "\n")
        f.write(" ".join(repr(float(v)) for v in k.ravel(order="F")) + "\n")


def _box_list(entry, name):
    b = entry[name] if (
        isinstance(entry, np.void)
        or (isinstance(entry, np.ndarray) and entry.dtype.names)
    ) else getattr(entry, name)
    b = np.asarray(b)
    if b.size == 0:
        return []
    return _struct_list(b)


def _write_label(path: str, data3d, data2d):
    """One line per box: ``classname x y w h cx cy cz c1 c2 c3 ox oy``
    (extract_rgbd_data_v2.m:63-71; box2d written as MATLAB ints, coeffs
    abs'd)."""
    boxes3d = _box_list(data3d, "groundtruth3DBB")
    boxes2d = _box_list(data2d, "groundtruth2DBB")
    with open(path, "w") as f:
        for j, b3 in enumerate(boxes3d):
            b2 = boxes2d[j]
            classname = _field(b3, "classname")
            assert _field(b2, "classname") == classname
            centroid = np.asarray(_field(b3, "centroid"), np.float64).ravel()
            orient = np.asarray(_field(b3, "orientation"), np.float64).ravel()
            coeffs = np.abs(
                np.asarray(_field(b3, "coeffs"), np.float64).ravel()
            )
            box2d = np.asarray(_field(b2, "gtBb2D"), np.float64).ravel()
            f.write(
                "%s %d %d %d %d %f %f %f %f %f %f %f %f\n" % (
                    classname, box2d[0], box2d[1], box2d[2], box2d[3],
                    centroid[0], centroid[1], centroid[2],
                    coeffs[0], coeffs[1], coeffs[2], orient[0], orient[1],
                )
            )


def extract_split(
    allsplit_path: str, meta_path: str, out_dir: str
) -> tuple[int, int]:
    """extract_split.m: map each image's depthpath grandparent dir against
    the alltrain/alltest path sets -> train_data_idx.txt / val_data_idx.txt
    (1-based ids)."""
    import scipy.io as sio

    d = sio.loadmat(allsplit_path)
    train_set = {
        str(_unwrap(p))[_STRIP:].rstrip("/")
        for p in np.asarray(d["alltrain"]).ravel()
    }
    val_set = {
        str(_unwrap(p))[_STRIP:].rstrip("/")
        for p in np.asarray(d["alltest"]).ravel()
    }
    meta = load_meta(meta_path)
    os.makedirs(out_dir, exist_ok=True)
    n_train = n_val = 0
    with open(os.path.join(out_dir, "train_data_idx.txt"), "w") as ftr, \
            open(os.path.join(out_dir, "val_data_idx.txt"), "w") as fva:
        for image_id, data in enumerate(meta, start=1):
            depthpath = str(_field(data, "depthpath"))[_STRIP:]
            folder = os.path.dirname(os.path.dirname(depthpath)).rstrip("/")
            if folder in train_set:
                ftr.write(f"{image_id}\n")
                n_train += 1
            elif folder in val_set:
                fva.write(f"{image_id}\n")
                n_val += 1
    return n_train, n_val


def main(argv=None):
    """CLI over the three extraction stages (the MATLAB scripts are
    run-as-script; paths here are arguments)."""
    import argparse

    p = argparse.ArgumentParser(prog="sunrgbd_extract", description=main.__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("v2", help="depth/image/calib/label from v2 meta")
    s.add_argument("--meta3d", required=True, help="SUNRGBDMeta3DBB_v2.mat")
    s.add_argument("--meta2d", required=True, help="SUNRGBDMeta2DBB_v2.mat")
    s.add_argument("--official_dir", required=True,
                   help="OFFICIAL_SUNRGBD root (prefixes the meta paths)")
    s.add_argument("--out_dir", required=True, help="sunrgbd_trainval/")
    s.add_argument("--no_images", action="store_true")

    s = sub.add_parser("v1", help="label_v1 from the v1 toolbox meta")
    s.add_argument("--meta", required=True, help="Metadata/SUNRGBDMeta.mat")
    s.add_argument("--out_dir", required=True)

    s = sub.add_parser("split", help="train/val idx lists")
    s.add_argument("--allsplit", required=True, help="allsplit.mat")
    s.add_argument("--meta", required=True, help="SUNRGBDMeta3DBB_v2.mat")
    s.add_argument("--out_dir", required=True)

    args = p.parse_args(argv)
    if args.cmd == "v2":
        done = extract_rgbd_data_v2(
            args.meta3d, args.meta2d, args.official_dir, args.out_dir,
            write_images=not args.no_images,
        )
        print(f"extracted {len(done)} images")
    elif args.cmd == "v1":
        done = extract_rgbd_data_v1(args.meta, args.out_dir)
        print(f"wrote {len(done)} v1 labels")
    elif args.cmd == "split":
        n_train, n_val = extract_split(args.allsplit, args.meta, args.out_dir)
        print(f"{n_train} train / {n_val} val")


if __name__ == "__main__":
    main()
