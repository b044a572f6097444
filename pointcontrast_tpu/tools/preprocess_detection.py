"""ScanNet detection data preparation.

Ports /root/reference/downstream/votenet_det_new/lib/datasets/scannet/
{load_scannet_data.py:20-146, batch_load_scannet_data.py:26-79,
scannet_utils.py}: mesh + aggregation json + segmentation json -> per-scene
``_vert.npy`` (xyzrgb), ``_sem_label.npy`` (nyu40 ids), ``_ins_label.npy``
(1-indexed instances), ``_bbox.npy`` (axis-aligned cx cy cz dx dy dz label),
with axis alignment applied, 50k-point cap and the 18 object class filter.
"""
from __future__ import annotations

import csv
import json
import os

import numpy as np

from pointcontrast_tpu.utils.ply import read_ply_xyzrgbl

OBJ_CLASS_IDS = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]
)
MAX_NUM_POINT = 50000


def read_label_mapping(tsv_path: str, label_from: str = "raw_category",
                       label_to: str = "nyu40id") -> dict:
    """scannetv2-labels.combined.tsv -> {raw category: nyu40 id}."""
    mapping = {}
    with open(tsv_path) as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            try:
                mapping[row[label_from]] = int(row[label_to])
            except (KeyError, ValueError):
                continue
    return mapping


def read_aggregation(path: str):
    object_id_to_segs = {}
    label_to_segs: dict = {}
    with open(path) as f:
        data = json.load(f)
    for group in data["segGroups"]:
        object_id = group["objectId"] + 1  # 1-indexed instances
        object_id_to_segs[object_id] = group["segments"]
        label_to_segs.setdefault(group["label"], []).extend(group["segments"])
    return object_id_to_segs, label_to_segs


def read_segmentation(path: str):
    with open(path) as f:
        data = json.load(f)
    seg_indices = np.asarray(data["segIndices"])
    seg_to_verts: dict = {}
    for i, seg in enumerate(seg_indices):
        seg_to_verts.setdefault(int(seg), []).append(i)
    return seg_to_verts, len(seg_indices)


def export_scene(scan_path: str, label_map_file: str,
                 output_prefix: str | None = None):
    """load_scannet_data.export equivalent for one scene directory."""
    scan_name = os.path.basename(os.path.normpath(scan_path))
    mesh_file = os.path.join(scan_path, scan_name + "_vh_clean_2.ply")
    agg_file = os.path.join(scan_path, scan_name + ".aggregation.json")
    seg_file = os.path.join(
        scan_path, scan_name + "_vh_clean_2.0.010000.segs.json"
    )
    meta_file = os.path.join(scan_path, scan_name + ".txt")

    label_map = read_label_mapping(label_map_file)
    coords, colors, _ = read_ply_xyzrgbl(mesh_file)
    mesh_vertices = np.hstack([coords, colors])

    axis_align = np.eye(4)
    if os.path.isfile(meta_file):
        for line in open(meta_file):
            if "axisAlignment" in line:
                vals = [
                    float(x)
                    for x in line.rstrip().strip("axisAlignment = ").split()
                ]
                axis_align = np.array(vals).reshape(4, 4)
                break
    pts = np.hstack([mesh_vertices[:, :3], np.ones((len(mesh_vertices), 1))])
    mesh_vertices[:, :3] = (pts @ axis_align.T)[:, :3]

    object_id_to_segs, label_to_segs = read_aggregation(agg_file)
    seg_to_verts, num_verts = read_segmentation(seg_file)
    label_ids = np.zeros(num_verts, dtype=np.uint32)
    for label, segs in label_to_segs.items():
        label_id = label_map.get(label, 0)
        for seg in segs:
            label_ids[seg_to_verts.get(seg, [])] = label_id
    instance_ids = np.zeros(num_verts, dtype=np.uint32)
    object_id_to_label_id = {}
    for object_id, segs in object_id_to_segs.items():
        for seg in segs:
            verts = seg_to_verts.get(seg, [])
            instance_ids[verts] = object_id
            if verts and object_id not in object_id_to_label_id:
                object_id_to_label_id[object_id] = label_ids[verts[0]]

    num_instances = len(object_id_to_segs)
    instance_bboxes = np.zeros((num_instances, 7))
    for obj_id in object_id_to_segs:
        label_id = object_id_to_label_id.get(obj_id, 0)
        obj_pc = mesh_vertices[instance_ids == obj_id, :3]
        if len(obj_pc) == 0:
            continue
        mins, maxs = obj_pc.min(0), obj_pc.max(0)
        instance_bboxes[obj_id - 1] = np.concatenate(
            [(mins + maxs) / 2, maxs - mins, [label_id]]
        )

    if output_prefix is not None:
        np.save(output_prefix + "_vert.npy", mesh_vertices)
        np.save(output_prefix + "_sem_label.npy", label_ids)
        np.save(output_prefix + "_ins_label.npy", instance_ids)
        np.save(output_prefix + "_bbox.npy", instance_bboxes)
    return mesh_vertices, label_ids, instance_ids, instance_bboxes


def batch_export(scans_dir: str, label_map_file: str, output_dir: str,
                 scan_names: list | None = None) -> list[str]:
    """batch_load_scannet_data.py:26-79: 50k-point cap, keep only the 18
    object classes in the bboxes."""
    os.makedirs(output_dir, exist_ok=True)
    if scan_names is None:
        scan_names = sorted(
            d for d in os.listdir(scans_dir)
            if os.path.isdir(os.path.join(scans_dir, d))
        )
    done = []
    for scan_name in scan_names:
        out_prefix = os.path.join(output_dir, scan_name)
        if os.path.exists(out_prefix + "_vert.npy"):
            continue
        verts, sem, ins, bboxes = export_scene(
            os.path.join(scans_dir, scan_name), label_map_file
        )
        # only bboxes are class-filtered; vertices keep ALL points
        # (batch_load_scannet_data.py:49-56 — do not mask sem/ins/verts)
        bboxes = bboxes[np.isin(bboxes[:, -1], OBJ_CLASS_IDS)]
        if len(verts) > MAX_NUM_POINT:
            choices = np.random.choice(len(verts), MAX_NUM_POINT, replace=False)
            verts, sem, ins = verts[choices], sem[choices], ins[choices]
        np.save(out_prefix + "_vert.npy", verts)
        np.save(out_prefix + "_sem_label.npy", sem)
        np.save(out_prefix + "_ins_label.npy", ins)
        np.save(out_prefix + "_bbox.npy", bboxes)
        done.append(scan_name)
    return done


def main(argv=None):
    """CLI mirroring the reference's batch_load_scannet_data.py (run-as-
    script with hardcoded paths; here the paths are arguments)."""
    import argparse

    p = argparse.ArgumentParser(prog="preprocess_detection",
                                description=main.__doc__)
    p.add_argument("--scans_dir", required=True, help="raw scans/ directory")
    p.add_argument("--label_map_file", required=True,
                   help="scannetv2-labels.combined.tsv")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--scan_names", nargs="*", default=None,
                   help="subset of scans (default: all subdirs)")
    args = p.parse_args(argv)
    done = batch_export(args.scans_dir, args.label_map_file, args.output_dir,
                        args.scan_names or None)
    print(f"exported {len(done)} scans")


if __name__ == "__main__":
    main()
