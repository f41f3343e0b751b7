"""Merged-config + dotlist system (utils/config.py; main.py:820-824 role)."""

import argparse

from adaprompt_tpu.utils import config as cfg


def test_yaml_merge_and_dotlist(tmp_path):
    a = tmp_path / "a.yaml"
    a.write_text("trainer:\n  d_coef: 1.0\n  warm: 100\ndata:\n  bs: 4\n")
    b = tmp_path / "b.yaml"
    b.write_text("trainer:\n  d_coef: 0.5\n")
    tree = cfg.load_config_tree([str(a), str(b)])
    assert tree["trainer"]["d_coef"] == 0.5      # later file wins
    assert tree["trainer"]["warm"] == 100        # non-overridden kept
    tree = cfg.apply_dotlist(tree, ["trainer.warm=42", "data.new=true",
                                    "data.lst=1,2,3"])
    assert tree["trainer"]["warm"] == 42
    assert tree["data"]["new"] is True
    assert tree["data"]["lst"] == [1, 2, 3]


def test_precedence_cli_over_yaml(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("trainer:\n  steps: 777\n  lr: 0.5\n")
    p = argparse.ArgumentParser()
    cfg.add_config_args(p)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--lr", type=float, default=1.0)
    argv = ["--base", str(y), "--steps", "999"]
    args = p.parse_args(argv)
    args = cfg.apply_config_files(args, p, argv)
    assert args.steps == 999      # explicit flag beats yaml
    assert args.lr == 0.5         # yaml beats default
