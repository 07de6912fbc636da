"""Config/flag-system tests: CLI parsing fixes and the snapshot writer.

Covers the two documented deviations from the reference added in round 2:
  * --analysisType accepts each implemented grouper individually (the
    reference's choices list contains the broken combined string
    "questionLength, programLength", reference config.py:149).
  * dumpJson overwrites instead of appending (reference main.py:652 "a+"
    corrupts the snapshot on a second run).
"""

import json

import pytest

from mac_network_tpu.config import Config, parse_args


@pytest.mark.parametrize("choice", ["questionLength", "programLength",
                                    "type", "arity"])
def test_analysis_type_individual_choices(choice):
    cfg = parse_args(["--analysisType", choice])
    assert cfg.analysisType == choice


def test_analysis_type_matches_groupers():
    # every CLI choice must have an implemented grouper
    from mac_network_tpu.config import _CHOICES
    from mac_network_tpu.train.logging import GROUPERS
    assert set(_CHOICES["analysisType"]) - {""} == set(GROUPERS)


def test_broken_reference_choice_rejected():
    with pytest.raises(SystemExit):
        parse_args(["--analysisType", "questionLength, programLength"])


def test_prefix_matching_still_works():
    # reference arg files rely on argparse prefix matching
    # (--clip -> --clipGradients, reference config.py:190)
    cfg = parse_args(["--clip"])
    assert cfg.clipGradients


def test_dump_json_overwrites(tmp_path):
    path = str(tmp_path / "config-x.json")
    cfg = Config()
    cfg.dumpJson(path)
    cfg.netLength = 4
    cfg.dumpJson(path)
    with open(path) as f:
        snap = json.load(f)          # parseable after a second run
    assert snap["netLength"] == 4


def test_prng_impl_flag():
    """--prngImpl defaults to the TPU hardware bit generator and switches
    jax's global key implementation via apply_prng_impl."""
    import jax
    from mac_network_tpu.config import apply_prng_impl

    cfg = parse_args([])
    assert cfg.prngImpl == "rbg"
    with pytest.raises(SystemExit):
        parse_args(["--prngImpl", "bogus"])

    cfg_tf = parse_args(["--prngImpl", "threefry"])
    before = jax.config.jax_default_prng_impl
    try:
        apply_prng_impl(cfg)
        assert jax.random.key(0).dtype.name.startswith("key<rbg")
        apply_prng_impl(cfg_tf)
        assert jax.random.key(0).dtype.name.startswith("key<fry")
    finally:
        jax.config.update("jax_default_prng_impl", before)
