"""dump_plans.stabilize: regen-stability normalization must be
session-stable (same structure, different JVM counters -> identical
bytes), literal-preserving, and instance-distinct (a self-join's two
column instances must NOT collapse to one token — review r11). No
Spark needed."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tools"),
)

from dump_plans import stabilize

PLAN_A = """Output [2]: [a#101L, b#102]
Condition: (a#101L = c#205L) AND rlike(b#102, 'thing #1')
Arguments: [plan_id=37]
Join: a#101L vs a#309L [plan_id=50]"""

# same structure, different session counters
PLAN_B = """Output [2]: [a#9001L, b#9002]
Condition: (a#9001L = c#9105L) AND rlike(b#9002, 'thing #1')
Arguments: [plan_id=88]
Join: a#9001L vs a#9309L [plan_id=91]"""


def test_same_structure_different_counters_normalize_identically():
    assert stabilize(PLAN_A) == stabilize(PLAN_B)


def test_string_literals_with_hash_digits_survive():
    assert "'thing #1'" in stabilize(PLAN_A)


def test_self_join_instances_stay_distinct():
    s = stabilize(PLAN_A)
    # a#101L appears three times -> one token; a#309L is a DIFFERENT
    # instance and must get a different token
    assert s.count("a#x1L") == 3
    assert "a#x4L" in s
    assert "plan_id=x1" in s and "plan_id=x2" in s


def test_moved_predicate_changes_output():
    """A regression that only moves a predicate between join instances
    must NOT normalize to identical bytes (the blanket '#x' erase the
    r11 review flagged would have)."""
    moved = PLAN_A.replace("(a#101L = c#205L)", "(a#309L = c#205L)")
    assert stabilize(moved) != stabilize(PLAN_A)


def test_aggregate_result_ids_after_paren_or_bracket_are_renumbered():
    """ADVICE r11: ids following ')' or ']' (aggregate/lambda results
    like 'count(1)#25L') were skipped by the plain word-char
    lookbehind, so a session-counter shift still churned those lines."""
    a = "Aggregate [count(1)#25L, sum(v#3L)#26L, transform(x)[0]#27]"
    b = "Aggregate [count(1)#925L, sum(v#93L)#926L, transform(x)[0]#927]"
    sa = stabilize(a)
    assert sa == stabilize(b)
    assert "#25" not in sa and "#26" not in sa and "#27" not in sa


def test_hash_digits_after_space_or_quote_still_survive():
    assert "like '#42'" in stabilize("Filter: like '#42' AND v#7 = 1")
