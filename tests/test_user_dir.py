"""--user-dir plugin mechanism (registry.import_user_module).

The reference's own research code plugs into fairseq via --user-dir
(fairseq/utils.py:464-507, `fairseq-train --user-dir research ...`); these
tests pin the equivalent here: an external package can register
tasks/models/criterions with the stock decorators and be driven through the
real CLI by name.
"""

import textwrap

import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import TASKS, import_user_module


def _write_plugin(tmp_path, name, task_name):
    pkg = tmp_path / name
    pkg.mkdir(exist_ok=True)
    (pkg / "__init__.py").write_text(textwrap.dedent(f"""
        from diffnorm_tpu.registry import register_task
        from diffnorm_tpu.tasks.dummy import DummyVAETask


        @register_task({task_name!r})
        class UserDummyVAETask(DummyVAETask):
            pass
    """))
    return pkg


def test_import_user_module_registers(tmp_path):
    pkg = _write_plugin(tmp_path, "my_plugin_a", "user_dummy_vae_a")
    import_user_module(str(pkg))
    assert "user_dummy_vae_a" in TASKS
    # idempotent for the same path
    import_user_module(str(pkg))


def test_missing_user_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        import_user_module(str(tmp_path / "nope"))


def test_user_dir_name_collision_raises(tmp_path):
    """A plugin whose basename collides with an already-imported module
    must fail loudly (reference fairseq/utils.py:490-507), not silently
    skip registration."""
    pkg = tmp_path / "json"  # stdlib collision
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    with pytest.raises(FileExistsError):
        import_user_module(str(pkg))


@pytest.mark.slow
def test_train_cli_with_user_dir(tmp_path):
    """The train CLI resolves a task registered only by the user dir."""
    from diffnorm_tpu.cli import train

    pkg = _write_plugin(tmp_path, "my_plugin_b", "user_dummy_vae_b")
    rc = train.main(Config(
        user_dir=str(pkg), task="user_dummy_vae_b",
        arch="speech_vae_decoder", criterion="speech_vae_decoder_loss",
        feature_dim=8, latent_dim=2, chan_mults=[2], vae_decoder_depth=1,
        vae_decoder_dim_head=4, vae_decoder_heads=2, target_code_size=8,
        batch_size=2, tokens_per_sample=8, dataset_size=2,
        lr=1e-3, warmup_updates=1, max_updates=1, log_interval=1,
        save_dir=str(tmp_path / "ckpt"), cpu=True,
    ))
    assert rc == 0


@pytest.mark.slow
def test_train_cli_prng_impl_rbg(tmp_path):
    """--prng-impl rbg (hardware-RNG dropout masks, the recipe default —
    PERFORMANCE.md "+37% NAR train throughput") trains end-to-end. Runs in
    a subprocess: jax_default_prng_impl is process-global."""
    import subprocess
    import sys

    code = (
        "from diffnorm_tpu.cli import train\n"
        "from diffnorm_tpu.config import Config\n"
        "rc = train.main(Config(prng_impl='rbg', task='dummy_vae',\n"
        "    arch='speech_vae_decoder', criterion='speech_vae_decoder_loss',\n"
        "    feature_dim=8, latent_dim=2, chan_mults=[2], vae_decoder_depth=1,\n"
        "    vae_decoder_dim_head=4, vae_decoder_heads=2, target_code_size=8,\n"
        "    batch_size=2, tokens_per_sample=8, dataset_size=2, dropout=0.1,\n"
        "    lr=1e-3, warmup_updates=1, max_updates=1, log_interval=1,\n"
        f"    save_dir={str(tmp_path / 'ckpt')!r}, cpu=True))\n"
        "raise SystemExit(rc)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
