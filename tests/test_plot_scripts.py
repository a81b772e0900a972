"""Plot CLIs (reference Diffusion_model/scripts/plot_loss.py,
plot_physics_metrics.py, VAE_model/plot_vae_loss.py): each must parse the
log contracts our trainers write and produce a PNG.

Modules are loaded by explicit file path: the reference predictor (imported
by the parity suites via tests/ref_loader.py) does its own sys.path surgery
that would otherwise shadow bare `import plot_vae_loss` with the REFERENCE's
script of the same name.
"""
import importlib.util
import os.path as osp

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))


def _load(name):
    path = osp.join(REPO, "scripts", name + ".py")
    spec = importlib.util.spec_from_file_location(f"ours_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_plot_loss_and_physics(shared_diffusion_dir, tmp_path):
    out = str(tmp_path / "loss.png")
    _load("plot_loss").main(["--model-dir", shared_diffusion_dir, "--output", out])
    assert osp.getsize(out) > 1000

    out2 = str(tmp_path / "phys.png")
    _load("plot_physics_metrics").main(
        ["--model-dirs", shared_diffusion_dir, shared_diffusion_dir,
         "--output", out2])
    assert osp.getsize(out2) > 1000


def test_plot_vae_loss_both_stages(shared_stage1_dir, shared_stage2_dir, tmp_path):
    plot_vae_loss = _load("plot_vae_loss")
    for i, d in enumerate((shared_stage1_dir, shared_stage2_dir)):
        out = str(tmp_path / f"vae{i}.png")
        plot_vae_loss.main(["--model-dir", d, "--output", out])
        assert osp.getsize(out) > 1000
