"""Rule-system tests, including the reference's junk-tolerance behaviour
(reference tests/test_env.py:17-39)."""

from carle_tpu import rules
from carle_tpu.env import CARLE


def test_parse_digits_junk_tolerance():
    # mirrors reference test: junk characters and '9' are ignored
    assert rules.parse_digits("asdfasdfB0357*!@#!@$%") == [0, 3, 5, 7]
    assert rules.parse_digits("S2468") == [2, 4, 6, 8]
    assert rules.parse_digits("9") == []
    assert rules.parse_digits("332211") == [1, 2, 3]


def test_parse_rulestring():
    b, s = rules.parse_rulestring("B0357/S2468")
    assert b == [0, 3, 5, 7]
    assert s == [2, 4, 6, 8]
    assert rules.rulestring(b, s) == "B0357/S2468"


def test_bit_packing_roundtrip():
    for b, s in [([3], [2, 3]), ([3, 6, 8], [2, 4, 5]), ([], []), ([0], list(range(9)))]:
        bits = rules.pack_rule_bits(b, s)
        assert rules.unpack_rule_bits(bits) == (b, s)


def test_named_rules():
    assert rules.unpack_rule_bits(rules.LIFE) == ([3], [2, 3])
    assert rules.unpack_rule_bits(rules.LIVE_FREE_OR_DIE) == ([2], [0])


def test_env_rule_setting_api():
    env = CARLE()
    env.birth_rule_from_string("asdfasdfB0357*!@#!@$%")
    env.survive_rule_from_string("S2468")
    assert env.birth == [0, 3, 5, 7]
    assert env.survive == [2, 4, 6, 8]

    env.rules_from_string("B0357/S2468")
    assert env.birth == [0, 3, 5, 7]
    assert env.survive == [2, 4, 6, 8]

    # mutation through attribute assignment (train_mcl.py:56-57 pattern)
    env.birth = [3]
    env.survive = [2, 3]
    assert int(env.state.rule_bits) == rules.LIFE
