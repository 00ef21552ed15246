"""Scaffolding layer: config system, scalar schedules, checkpoints, saving."""

import os

import numpy as np
import pytest

from worldrenderer_tpu.utils import (
    C,
    ExperimentConfig,
    SaverMixin,
    load_checkpoint,
    load_config,
    save_checkpoint,
)
from worldrenderer_tpu.utils.config import from_dotlist, merge_dicts, resolve
from worldrenderer_tpu.utils.misc import load_module_weights


def test_config_yaml_merge_and_cli(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("name: exp\nseed: 1\ndata: {batch: 4, res: 64}\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"extends: {base}\ndata: {{res: 128}}\ntag: t\n")
    cfg = load_config(
        str(child),
        cli_args=["data.batch=8", "seed=7"],
        makedirs=False,
        exp_root_dir=str(tmp_path / "out"),
        use_timestamp=False,
    )
    assert cfg.name == "exp"
    assert cfg.seed == 7
    assert cfg.data == {"batch": 8, "res": 128}
    assert cfg.trial_dir.endswith(os.path.join("exp", "t"))


def test_config_resolvers():
    d = resolve(
        {
            "a": 4,
            "b": "${mul:${a},3}",
            "c": "${idiv:${b},5}",
            "d": "${not:${gt0:${a}}}",
            "steps": "${calc_num_train_steps:1024,4,10,1,8}",
        }
    )
    assert d["b"] == 12
    assert d["c"] == 2
    assert d["d"] is False
    assert d["steps"] == 320


def test_dotlist_types():
    d = from_dotlist(["a.b=1", "a.c=true", "x=hello", "y=1.5"])
    assert d == {"a": {"b": 1, "c": True}, "x": "hello", "y": 1.5}


def test_merge_dicts_deep():
    out = merge_dicts({"a": {"b": 1, "c": 2}}, {"a": {"c": 3}, "d": 4})
    assert out == {"a": {"b": 1, "c": 3}, "d": 4}


def test_scalar_schedule():
    assert C(2.5, 0, 0) == 2.5
    # [start_step, start_value, end_value, end_step]
    assert C([0, 0.0, 1.0, 10], 0, 5) == 0.5
    assert C([0, 0.0, 1.0, 10], 0, 20) == 1.0
    # 3-element form prepends start_step=0
    assert C([1.0, 0.0, 10], 0, 5) == 0.5
    # float end_step keys on epoch
    assert C([0, 0.0, 1.0, 10.0], 5, 99999) == 0.5


def test_checkpoint_roundtrip(tmp_path):
    state = {"tex": np.ones((4, 4, 3)), "opt": {"mu": np.zeros(3)}}
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, epoch=2, global_step=100)
    loaded, epoch, step = load_checkpoint(path)
    assert epoch == 2 and step == 100
    np.testing.assert_array_equal(loaded["tex"], state["tex"])
    np.testing.assert_array_equal(loaded["opt"]["mu"], state["opt"]["mu"])

    flat, _, _ = load_module_weights(path, module_name="opt")
    np.testing.assert_array_equal(flat["mu"], state["opt"]["mu"])


def test_saver_mixin(tmp_path, rng):
    s = SaverMixin()
    s.set_save_dir(str(tmp_path))
    img = rng.random((16, 16, 3)).astype(np.float32)
    p = s.save_rgb_image("a/img.png", img)
    assert os.path.exists(p)
    p = s.save_image_grid("grid.png", [img, img, img, img], texts=["a", "b", "c", "d"])
    assert os.path.exists(p)
    p = s.save_grayscale_image("gray.png", img[..., 0], cmap="jet")
    assert os.path.exists(p)
    p = s.save_npz("arr.npz", x=img)
    assert os.path.exists(p)


def test_saver_video_assembly(tmp_path, rng):
    s = SaverMixin()
    s.set_save_dir(str(tmp_path))
    for i in range(5):
        s.save_rgb_image(f"seq/frame_{i:03d}.png", rng.random((16, 16, 3)).astype(np.float32))
    p = s.save_img_sequence("anim", "seq", r"frame_\d+\.png", save_format="gif", fps=5)
    assert os.path.exists(p) and p.endswith(".gif")


def test_updateable_recursion_children_first():
    """do_update_step visits instance-attribute children before self and
    skips underscore-prefixed attributes (reference base.py:22-66 walk)."""
    from worldrenderer_tpu.utils.base import BaseObject, update_if_possible

    calls = []

    class Child(BaseObject):
        def update_step(self, epoch, step, on_load_weights=False):
            calls.append(("child", epoch, step))

    class Parent(BaseObject):
        def configure(self):
            self.child = Child()
            self._hidden = Child()  # private: must not be walked

        def update_step(self, epoch, step, on_load_weights=False):
            calls.append(("parent", epoch, step))

    update_if_possible(Parent(), 2, 7)
    assert calls == [("child", 2, 7), ("parent", 2, 7)]


def test_logging_handler_micro_api():
    """Handler add/remove + default-handler toggle + explicit format
    (reference logging.py:183-264 contract)."""
    import io
    import logging as pylog

    from worldrenderer_tpu.utils import logging as wlog

    logger = wlog.get_logger("handler_test")
    buf = io.StringIO()
    custom = pylog.StreamHandler(buf)
    wlog.add_handler(custom)
    try:
        wlog.set_verbosity_info()
        wlog.disable_default_handler()
        logger.info("captured-line")
        assert "captured-line" in buf.getvalue()

        wlog.enable_explicit_format()
        logger.info("formatted-line")
        assert ">> formatted-line" in buf.getvalue()
        wlog.reset_format()
        logger.info("plain-line")
        assert ">> plain-line" not in buf.getvalue()

        wlog.enable_default_handler()
        root = wlog.get_logger()
        assert sum(1 for _ in root.handlers) >= 2
        assert sorted(wlog.get_log_levels_dict())[0] == "critical"

        wlog.disable_propagation()
        assert root.propagate is False
        wlog.enable_propagation()
        assert root.propagate is True
        wlog.disable_propagation()
    finally:
        wlog.remove_handler(custom)
        wlog.set_verbosity_warning()
        assert custom not in wlog.get_logger().handlers


def test_import_does_not_initialize_backend():
    """Importing the package must not touch the JAX backend: an import-time
    device constant once initialized XLA before jax.distributed.initialize
    could run (and claimed the TPU tunnel on bare imports). Runs in a
    subprocess so this test is immune to the suite's own backend state."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "import worldrenderer_tpu\n"
        "import worldrenderer_tpu.ops.gbuffer\n"
        "import worldrenderer_tpu.ops.rasterize\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, 'backend initialized at import time'\n"
        "print('IMPORT_CLEAN')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "IMPORT_CLEAN" in out.stdout
