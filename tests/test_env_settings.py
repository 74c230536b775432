"""Env-driven settings layer (REFIMAGE_RAY_*) — precedence
flag > env > default, per the reference's Settings-from-env analog
(/root/reference/src/refimage/config.py:1-103)."""

from __future__ import annotations

import pytest

from refimage_ray.config import (
    DEFAULT_CONFIG,
    EngineConfig,
    cli_env_defaults,
    engine_config_from_env,
)


def test_engine_config_from_env_types_and_default():
    env = {
        "REFIMAGE_RAY_K1": "0.9",
        "REFIMAGE_RAY_NUM_SHARDS": "16",
        "REFIMAGE_RAY_STORE_POSITIONS": "true",
        "REFIMAGE_RAY_TERM_FILTER": "s_stem",
        "UNRELATED": "x",
    }
    cfg = engine_config_from_env(environ=env)
    assert cfg.k1 == 0.9
    assert cfg.num_shards == 16
    assert cfg.store_positions is True
    assert cfg.term_filter == "s_stem"
    # untouched fields keep their defaults
    assert cfg.b == DEFAULT_CONFIG.b
    # empty env -> the base comes back unchanged
    assert engine_config_from_env(environ={}) == DEFAULT_CONFIG
    # explicit base wins for non-overridden fields
    base = EngineConfig(salt_buckets=2)
    assert engine_config_from_env(base, {"REFIMAGE_RAY_K1": "2.0"}) == \
        base.with_(k1=2.0)


def test_engine_config_from_env_bool_falsey():
    for raw in ("0", "false", "no", "off", ""):
        cfg = engine_config_from_env(
            environ={"REFIMAGE_RAY_STORE_POSITIONS": raw})
        assert cfg.store_positions is False, raw


def test_engine_config_from_env_rejects_bad_values():
    with pytest.raises(ValueError):
        engine_config_from_env(
            environ={"REFIMAGE_RAY_TERM_FILTER": "bogus"})
    with pytest.raises(ValueError):
        engine_config_from_env(environ={"REFIMAGE_RAY_NUM_SHARDS": "many"})


def test_cli_env_defaults_map():
    env = {
        "REFIMAGE_RAY_INDEX": "/tmp/idx",
        "REFIMAGE_RAY_PORT": "9090",
        "REFIMAGE_RAY_NUM_CPUS": "4",
        "REFIMAGE_RAY_K1": "0.9",  # engine field, not a CLI dest
    }
    d = cli_env_defaults(env)
    assert d == {"index": "/tmp/idx", "port": 9090, "num_cpus": 4}


def test_cli_precedence_flag_over_env(monkeypatch, tmp_path, capsys):
    """The parser resolves flag > env > default, and an env value
    satisfies a `required` --index (the `explain` command needs no
    artifact, so parse effects are observable without a build)."""
    import refimage_ray.__main__ as cli

    import json

    monkeypatch.setenv("REFIMAGE_RAY_NUM_SHARDS", "1")
    # explain routes terms to shard = hash % num_shards: env default
    # of 1 shard pins every term to shard 0
    rc = cli.main(["explain", "spark AND join"])
    assert rc == 0
    plan1 = json.loads(capsys.readouterr().out)

    def shards(node):
        for op in node.get("operands", []):
            yield from shards(op)
        for t in node.get("terms", []):
            yield t["shard"]

    assert set(shards(plan1["plan"])) == {0}
    # explicit flag beats env
    rc = cli.main(["explain", "spark AND join", "--num-shards", "4"])
    assert rc == 0
    plan2 = json.loads(capsys.readouterr().out)
    assert any(s != 0 for s in shards(plan2["plan"]))
