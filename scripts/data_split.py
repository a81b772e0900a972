#!/usr/bin/env python
"""Generate or verify splits.json — the reference's `python shared/data_split.py`
CLI (data_split.py:401-512). Logic lives in
diffusion_model_project_tpu/data/split.py."""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from diffusion_model_project_tpu.data.split import main

if __name__ == "__main__":
    raise SystemExit(main())
