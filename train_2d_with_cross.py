#!/usr/bin/env python
"""Stage-2 VAE training CLI (reference VAE_model/train_2d_with_cross.py)."""
from diffusion_model_project_tpu.training.train_vae_stage2 import main

if __name__ == "__main__":
    main()
