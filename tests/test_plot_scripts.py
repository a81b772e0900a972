"""Plot CLIs (reference Diffusion_model/scripts/plot_loss.py,
plot_physics_metrics.py, VAE_model/plot_vae_loss.py): each must parse the
log contracts our trainers write and produce a PNG."""
import os.path as osp
import sys

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "scripts"))


def test_plot_loss_and_physics(shared_diffusion_dir, tmp_path):
    import plot_loss
    import plot_physics_metrics

    out = str(tmp_path / "loss.png")
    plot_loss.main(["--model-dir", shared_diffusion_dir, "--output", out])
    assert osp.getsize(out) > 1000

    out2 = str(tmp_path / "phys.png")
    plot_physics_metrics.main(
        ["--model-dirs", shared_diffusion_dir, shared_diffusion_dir,
         "--output", out2])
    assert osp.getsize(out2) > 1000


def test_plot_vae_loss_both_stages(shared_stage1_dir, shared_stage2_dir, tmp_path):
    import plot_vae_loss

    for i, d in enumerate((shared_stage1_dir, shared_stage2_dir)):
        out = str(tmp_path / f"vae{i}.png")
        plot_vae_loss.main(["--model-dir", d, "--output", out])
        assert osp.getsize(out) > 1000
