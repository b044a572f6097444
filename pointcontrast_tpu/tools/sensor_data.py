"""ScanNet ``.sens`` (SensorData v4) parser + exporters.

Behavioral mirror of
/root/reference/pretrain/data_preprocess/scannet_pair/SensorData.py:16-136:
binary layout is version(u32), sensor name, 4x(4x4 f32 intrinsics/
extrinsics), compression types (i32), color/depth dims (u32), depth shift
(f32), num_frames (u64), then per frame: camera_to_world 4x4 f32, two u64
timestamps, two u64 sizes, jpeg color bytes, zlib'd u16 depth bytes.

Parsing is numpy+struct only; depth decompression is zlib; color frames are
kept as raw JPEG bytes (the pair pipeline never needs decoded color).
"""
from __future__ import annotations

import os
import struct
import zlib

import numpy as np

COMPRESSION_TYPE_COLOR = {-1: "unknown", 0: "raw", 1: "png", 2: "jpeg"}
COMPRESSION_TYPE_DEPTH = {
    -1: "unknown", 0: "raw_ushort", 1: "zlib_ushort", 2: "occi_ushort"
}


class RGBDFrame:
    __slots__ = (
        "camera_to_world", "timestamp_color", "timestamp_depth",
        "color_data", "depth_data",
    )

    def load(self, f):
        self.camera_to_world = np.frombuffer(
            f.read(16 * 4), dtype=np.float32
        ).reshape(4, 4)
        self.timestamp_color = struct.unpack("Q", f.read(8))[0]
        self.timestamp_depth = struct.unpack("Q", f.read(8))[0]
        color_bytes = struct.unpack("Q", f.read(8))[0]
        depth_bytes = struct.unpack("Q", f.read(8))[0]
        self.color_data = f.read(color_bytes)
        self.depth_data = f.read(depth_bytes)

    def decompress_depth(self, compression_type: str, height: int, width: int):
        if compression_type != "zlib_ushort":
            raise ValueError(f"unsupported depth compression {compression_type}")
        raw = zlib.decompress(self.depth_data)
        return np.frombuffer(raw, dtype=np.uint16).reshape(height, width)


class SensorData:
    VERSION = 4

    def __init__(self, filename: str):
        with open(filename, "rb") as f:
            version = struct.unpack("I", f.read(4))[0]
            if version != self.VERSION:
                raise ValueError(f"unsupported .sens version {version}")
            strlen = struct.unpack("Q", f.read(8))[0]
            self.sensor_name = f.read(strlen).decode("ascii", "replace")
            self.intrinsic_color = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
            self.extrinsic_color = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
            self.intrinsic_depth = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
            self.extrinsic_depth = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
            self.color_compression_type = COMPRESSION_TYPE_COLOR[
                struct.unpack("i", f.read(4))[0]
            ]
            self.depth_compression_type = COMPRESSION_TYPE_DEPTH[
                struct.unpack("i", f.read(4))[0]
            ]
            self.color_width = struct.unpack("I", f.read(4))[0]
            self.color_height = struct.unpack("I", f.read(4))[0]
            self.depth_width = struct.unpack("I", f.read(4))[0]
            self.depth_height = struct.unpack("I", f.read(4))[0]
            self.depth_shift = struct.unpack("f", f.read(4))[0]
            num_frames = struct.unpack("Q", f.read(8))[0]
            self.frames = []
            for _ in range(num_frames):
                frame = RGBDFrame()
                frame.load(f)
                self.frames.append(frame)

    def export_depth_arrays(self, output_path: str, frame_skip: int = 1):
        """Depth as .npy u16 arrays (the reference writes 16-bit PNGs; npy
        avoids the imageio dependency and loads faster)."""
        os.makedirs(output_path, exist_ok=True)
        for i in range(0, len(self.frames), frame_skip):
            depth = self.frames[i].decompress_depth(
                self.depth_compression_type, self.depth_height, self.depth_width
            )
            np.save(os.path.join(output_path, f"{i}.npy"), depth)

    def export_poses(self, output_path: str, frame_skip: int = 1):
        os.makedirs(output_path, exist_ok=True)
        for i in range(0, len(self.frames), frame_skip):
            np.savetxt(
                os.path.join(output_path, f"{i}.txt"),
                self.frames[i].camera_to_world, fmt="%f",
            )

    def export_intrinsics(self, output_path: str):
        os.makedirs(output_path, exist_ok=True)
        for name, mat in [
            ("intrinsic_color", self.intrinsic_color),
            ("extrinsic_color", self.extrinsic_color),
            ("intrinsic_depth", self.intrinsic_depth),
            ("extrinsic_depth", self.extrinsic_depth),
        ]:
            np.savetxt(os.path.join(output_path, f"{name}.txt"), mat, fmt="%f")
