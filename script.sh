#!/usr/bin/env bash
# Launch matrix; parity with the reference's script.sh (accelerate/NCCL
# replaced by plain python — data parallelism comes from jit + the jax mesh,
# and multi-host runs are configured through JAX_COORDINATOR_ADDRESS etc.).

# ---------------- Inference ----------------
## Classification
python main/cls/test_edtr.py     --config configs/cls/cub200/test/006_edtr-s1.yaml --save-img      # EDTR
python main/cls/test_diffbir.py  --config configs/cls/cub200/test/005_diffbir.yaml                 # DiffBIR
python main/cls/test_cls.py      --config configs/cls/cub200/test/000_oracle.yaml                  # Oracle
python main/cls/test_cls.py      --config configs/cls/cub200/test/001_lq.yaml                      # No-restoration
python main/cls/test_swinir.py   --config configs/cls/cub200/test/004_swinir-sr4ir.yaml            # SwinIR-SR4IR

## Segmentation
python main/seg/test_edtr.py     --config configs/seg/voc2012/test/007_edtr-s4.yaml                # EDTR
python main/seg/test_diffbir.py  --config configs/seg/voc2012/test/005_diffbir.yaml                # DiffBIR
python main/seg/test_seg.py      --config configs/seg/voc2012/test/000_oracle.yaml                 # Oracle
python main/seg/test_seg.py      --config configs/seg/voc2012/test/001_lq.yaml                     # No-restoration
python main/seg/test_swinir.py   --config configs/seg/voc2012/test/004_swinir-sr4ir.yaml           # SwinIR-SR4IR

## Detection
python main/det/test_edtr.py     --config configs/det/voc2012/test/007_edtr-s4.yaml --save-img     # EDTR
python main/det/test_diffbir.py  --config configs/det/voc2012/test/005_diffbir.yaml                # DiffBIR
python main/det/test_det.py      --config configs/det/voc2012/test/000_oracle.yaml                 # Oracle
python main/det/test_det.py      --config configs/det/voc2012/test/001_lq.yaml                     # No-restoration
python main/det/test_swinir.py   --config configs/det/voc2012/test/004_swinir-sr4ir.yaml           # SwinIR-SR4IR

# ---------------- Training ----------------
## Classification
python main/cls/train_swinir-pre.py   --config configs/cls/cub200/train/002_swinir-pre.yaml        # SwinIR-Pre
python main/cls/train_edtr.py         --config configs/cls/cub200/train/007_edtr-s4.yaml           # EDTR
python main/cls/train_diffbir.py      --config configs/cls/cub200/train/005_diffbir.yaml           # DiffBIR
python main/cls/train_cls.py          --config configs/cls/cub200/train/000_oracle.yaml            # Oracle
python main/cls/train_cls.py          --config configs/cls/cub200/train/001_lq.yaml                # No-restoration
python main/cls/train_swinir-sr4ir.py --config configs/cls/cub200/train/004_swinir-sr4ir.yaml      # SwinIR-SR4IR

## Segmentation
python main/seg/train_swinir-pre.py   --config configs/seg/voc2012/train/002_swinir-pre.yaml       # SwinIR-Pre
python main/seg/train_edtr.py         --config configs/seg/voc2012/train/007_edtr-s4.yaml          # EDTR
python main/seg/train_diffbir.py      --config configs/seg/voc2012/train/005_diffbir.yaml          # DiffBIR
python main/seg/train_seg.py          --config configs/seg/voc2012/train/000_oracle.yaml           # Oracle
python main/seg/train_seg.py          --config configs/seg/voc2012/train/001_lq.yaml               # No-restoration
python main/seg/train_swinir-sr4ir.py --config configs/seg/voc2012/train/004_swinir-sr4ir.yaml     # SwinIR-SR4IR

## Detection
python main/det/train_swinir-pre.py   --config configs/det/voc2012/train/002_swinir-pre.yaml       # SwinIR-Pre
python main/det/train_edtr.py         --config configs/det/voc2012/train/007_edtr-s4.yaml          # EDTR
python main/det/train_diffbir.py      --config configs/det/voc2012/train/005_diffbir.yaml          # DiffBIR
python main/det/train_det.py          --config configs/det/voc2012/train/000_oracle.yaml           # Oracle
python main/det/train_det.py          --config configs/det/voc2012/train/001_lq.yaml               # No-restoration
python main/det/train_swinir-sr4ir.py --config configs/det/voc2012/train/004_swinir-sr4ir.yaml     # SwinIR-SR4IR
