"""Offline data-preparation tools.

Ports of /root/reference/pretrain/data_preprocess/scannet_pair/ (the
pair-generation pipeline: .sens parsing -> depth unprojection -> pairwise
overlap -> pair list) and the downstream dataset preprocessors, numpy-only
(the reference needs open3d + imageio + cv2; here depth PNGs are read with a
minimal reader and matching uses the vectorized grid-hash join).
"""
