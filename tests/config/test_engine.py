"""Config engine tests: composition, interpolation, overrides, instantiation."""

from pathlib import Path

import pytest

from latice_tpu.config import (
    expand_sweeps,
    instantiate,
    load_config,
    maybe_instantiate,
)


@pytest.fixture
def conf_tree(tmp_path):
    (tmp_path / "grp").mkdir()
    (tmp_path / "train.yaml").write_text(
        "defaults:\n"
        "  - grp: default.yaml\n"
        "  - _self_\n"
        "root_dir: ${hydra:runtime.cwd}\n"
        "data_dir: ${root_dir}/data\n"
        "seed: 0\n"
        "grp:\n"
        "  extra: 99\n"
    )
    (tmp_path / "grp" / "default.yaml").write_text(
        "name: base\nvalue: 1\npath: ${data_dir}/x.npy\n"
    )
    (tmp_path / "grp" / "alt.yaml").write_text("name: alt\nvalue: 2\n")
    return tmp_path


class TestLoadConfig:
    def test_composition_and_self_override(self, conf_tree):
        cfg = load_config(conf_tree, "train.yaml", runtime_cwd="/cwd")
        assert cfg["grp"]["name"] == "base"
        assert cfg["grp"]["extra"] == 99  # _self_ wins after group
        assert cfg["root_dir"] == "/cwd"
        assert cfg["grp"]["path"] == "/cwd/data/x.npy"  # chained interpolation

    def test_group_selection_override(self, conf_tree):
        cfg = load_config(conf_tree, "train.yaml", ["grp=alt"], runtime_cwd="/c")
        assert cfg["grp"]["name"] == "alt"
        assert cfg["grp"]["value"] == 2

    def test_value_overrides_typed(self, conf_tree):
        cfg = load_config(
            conf_tree,
            "train.yaml",
            ["grp.value=42", "seed=null", "grp.name=x"],
            runtime_cwd="/c",
        )
        assert cfg["grp"]["value"] == 42
        assert cfg["seed"] is None
        assert cfg["grp"]["name"] == "x"

    def test_unresolvable_interpolation_raises(self, tmp_path):
        (tmp_path / "c.yaml").write_text("a: ${missing.key}\n")
        with pytest.raises(KeyError, match="missing.key"):
            load_config(tmp_path, "c.yaml")

    def test_real_conf_tree_loads(self):
        cfg = load_config(Path(__file__).parents[2] / "conf", "train.yaml")
        assert cfg["lightning_module"]["kl_lambda"] == 5e-6
        assert cfg["data_module"]["batch_size"] == 64
        assert cfg["trainer"]["precision"] == "16-mixed"
        assert cfg["trainer"]["max_epochs"] == 2

    def test_robust_trainer_variant_instantiates(self):
        """trainer=robust: the augmented denoising-VAE config yields a
        Trainer with a compiled augment callable."""
        cfg = load_config(
            Path(__file__).parents[2] / "conf", "train.yaml",
            overrides=["trainer=robust", "root_dir=/tmp/engine_test"],
        )
        t = cfg["trainer"]
        assert t["denoising"] is True
        assert t["augment"]["noise_std"] == 0.05
        from latice_tpu.config.engine import instantiate

        trainer = instantiate(
            {k: v for k, v in t.items() if k not in ("accelerator", "devices", "logger", "checkpoint_dir")}
        )
        assert callable(trainer.augment) and trainer.denoising


class TestInstantiate:
    def test_basic_target(self):
        obj = instantiate({"_target_": "collections.Counter", "red": 2})
        assert obj["red"] == 2

    def test_partial(self):
        fn = instantiate({"_target_": "operator.add", "_partial_": True})
        assert fn(2, 3) == 5

    def test_nested(self):
        obj = instantiate(
            {
                "_target_": "builtins.dict",
                "inner": {"_target_": "collections.Counter", "a": 1},
            }
        )
        assert obj["inner"]["a"] == 1

    def test_maybe_instantiate_passthrough(self):
        sentinel = object()
        assert maybe_instantiate(sentinel) is sentinel

    def test_maybe_instantiate_type_check(self):
        with pytest.raises(AssertionError):
            maybe_instantiate({"_target_": "collections.Counter"}, expected_type=list)

    def test_module_from_config(self):
        """The real lightning_module config instantiates a working VAEModule."""
        cfg = load_config(Path(__file__).parents[2] / "conf", "train.yaml")
        from latice_tpu.train.module import VAEModule

        module = maybe_instantiate(cfg["lightning_module"], VAEModule)
        assert module.loss_fn.kl_lambda == 5e-6
        assert module.model.inplanes == 32
        assert module.scheduler.patience == 10


class TestSweeps:
    def test_cartesian_product(self):
        runs = expand_sweeps(["a=1,2", "b=x", "c=7,8"])
        assert len(runs) == 4
        assert ["a=1", "b=x", "c=7"] in runs
        assert ["a=2", "b=x", "c=8"] in runs

    def test_no_sweep(self):
        assert expand_sweeps(["a=1"]) == [["a=1"]]


class TestTrainCLIMultirun:
    def test_multirun_two_jobs(self, tmp_path, monkeypatch):
        """train.py -m expands sweeps and runs each job end to end."""
        import sys
        import numpy as np

        rng = np.random.default_rng(0)
        n = 12
        data = tmp_path / "data"
        data.mkdir()
        np.save(data / "p.npy", rng.uniform(size=(n, 128, 128)))
        (data / "a.txt").write_text(
            "eu\n%d\n" % n
            + "".join(f"{a[0]} {a[1]} {a[2]}\n" for a in rng.uniform(0, 360, (n, 3)))
        )
        monkeypatch.chdir(tmp_path)
        import importlib
        sys.path.insert(0, "/root/repo")
        train_mod = importlib.import_module("train")

        monkeypatch.setattr(
            sys,
            "argv",
            [
                "train.py",
                "-m",
                "--config-path", "/root/repo/conf",
                f"data_module.path={data}/p.npy",
                f"data_module.rot_angles_path={data}/a.txt",
                "data_module.batch_size=6",
                "data_module.val_data_ratio=0.34",
                "lightning_module.model.inplanes=2",
                "lightning_module.model.latent_dim=8",
                "trainer.max_epochs=1",
                "trainer.precision=32",
                "trainer.recon_figure=false",
                "seed=0,1",
            ],
        )
        train_mod.main()
        # both sweep jobs produced checkpoints (same dir; last one wins)
        assert (tmp_path / "checkpoints" / "last").exists()
