"""CLI applications: pretrain / semseg finetune / votenet finetune.

Replace the reference entry points (pretrain/pointcontrast/ddp_train.py,
downstream/semseg/ddp_main.py, downstream/votenet_det_new/ddp_main.py):
single-controller JAX — no process spawning, no NCCL init; the data-parallel
mesh covers all visible devices.
"""
