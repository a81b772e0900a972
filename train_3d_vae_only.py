#!/usr/bin/env python
"""Stage-1 VAE training CLI (reference VAE_model/train_3d_vae_only.py)."""
from diffusion_model_project_tpu.training.train_vae_stage1 import main

if __name__ == "__main__":
    main()
