"""Seeded fuzz of the OTTL compiler's TOTALITY claim.

builders.py asserts compiled conditions are total functions — ANSI mode
(Spark 4) makes that a live hazard: any un-guarded cast/arith over a
string path throws at runtime. This generates a few hundred random
conditions over every supported form (paths, literals, converters,
arithmetic, ParseJSON, comparisons, boolean composition), compiles each
that build-validation accepts in BOTH error modes, and evaluates all of
them in ONE Spark job against adversarial span rows (garbage numerics,
empty attrs, JSON and non-JSON values, nil everywhere). Any runtime
exception or out-of-domain decision fails the test.
"""

import random

import pytest

from atlassian_sampling_processor_spark import decision as D
from atlassian_sampling_processor_spark.policies import OTTLCondition, PolicyError

from .test_policies_golden import SPAN_SCHEMA, span_row

PATHS = [
    'attributes["k1"]', 'attributes["num"]', 'attributes["missing"]',
    'attributes["t"]',
    'resource.attributes["service.name"]', "name", "kind", "status.code",
    "start_time_unix_nano", "end_time_unix_nano",
    "instrumentation_scope.name", "instrumentation_scope.version",
    "trace_id.string", "span_id.string",
]
TIME_OPS = [  # wave 6: time-typed expressions (paths + Time parses)
    "start_time", "end_time",
    'Time(attributes["t"], "%Y-%m-%d %H:%M:%S")',
    'TruncateTime(Time(attributes["t"], "%Y-%m-%d %H:%M:%S"), Duration("1m"))',
    'TruncateTime(start_time, Duration("2s"))',
]
LITS = ['"x"', '"42"', "7", "3.5", "-1", "0", "true", "false", "nil"]
CMPS = ["==", "!=", ">", ">=", "<", "<="]


def rnd_operand(rng: random.Random, depth: int = 0) -> str:
    if depth >= 2:
        return rng.choice(PATHS + LITS)
    roll = rng.random()
    inner = lambda: rnd_operand(rng, depth + 1)  # noqa: E731
    if roll < 0.35:
        return rng.choice(PATHS)
    if roll < 0.5:
        return rng.choice(LITS)
    if roll < 0.56:
        return f"Len({inner()})"
    if roll < 0.62:
        return f"Substring({inner()}, {rng.randint(0, 2)}, {rng.randint(1, 3)})"
    if roll < 0.67:
        return f'ConvertCase({inner()}, "{rng.choice(["upper", "lower"])}")'
    if roll < 0.74:
        return f"{rng.choice(['Int', 'Double', 'String'])}({inner()})"
    if roll < 0.8:
        return f'Concat([{inner()}, {inner()}], "-")'
    if roll < 0.84:
        return f"{inner()} {rng.choice(['+', '-'])} {inner()}"
    if roll < 0.88:
        return f'ParseJSON({inner()})["a"]'
    if roll < 0.91:
        return f"{rng.choice(['UnixNano', 'Hour'])}({rng.choice(TIME_OPS)})"
    if roll < 0.94:
        return f'Split({inner()}, "{rng.choice([",", "-"])}")[{rng.randint(0, 2)}]'
    if roll < 0.955:  # wave 7: string converters
        return rng.choice(
            [f"Trim({inner()})", f'Trim({inner()}, "xy ")',
             f"SHA1({inner()})", f"SHA256({inner()})", f"MD5({inner()})"]
        )
    if roll < 0.97:  # wave 7: duration folds (build-rejected on strings)
        fold = rng.choice(["Hours", "Minutes", "Seconds",
                           "Milliseconds", "Microseconds", "Nanoseconds"])
        dur_lit = 'Duration("90s")'
        return f"{fold}({rng.choice([inner(), dur_lit])})"
    if roll < 0.985:  # wave 7: calendar parts / unix divisions
        part = rng.choice(["Day", "Month", "Year", "Minute", "Second",
                           "UnixSeconds", "UnixMilli", "UnixMicro"])
        return f"{part}({rng.choice(TIME_OPS)})"
    if roll < 0.99:
        return f"Log({inner()})"
    if roll < 0.996:  # wave 8/9 string/bytes converters
        return rng.choice(
            [
                f"Hex({inner()})",
                f"FNV({inner()})",
                f"Murmur3Hash({inner()})",
                f'Decode({inner()}, "base64")',
                f'Format("w8=%s", [{inner()}])',
                f'ParseKeyValue({inner()})["k1"]',
                f'ExtractPatterns({inner()}, "(?P<d>[0-9]+)")["d"]',
                f'Sort(Split({inner()}, ","), "{rng.choice(["asc", "desc"])}")'
                f"[{rng.randint(0, 2)}]",
                f'ConvertCase({inner()}, "{rng.choice(["snake", "camel"])}")',
            ]
        )
    return f'Duration("{rng.choice(["5ms", "2s", "1h30m"])}")'


def rnd_bool(rng: random.Random, depth: int = 0) -> str:
    roll = rng.random()
    if depth >= 2 or roll < 0.45:
        return f"{rnd_operand(rng)} {rng.choice(CMPS)} {rnd_operand(rng)}"
    if roll < 0.55:
        return f'IsMatch({rnd_operand(rng)}, "ab?c")'
    if roll < 0.6:
        return "IsRootSpan()"
    if roll < 0.68:
        return f"{rng.choice(['IsString', 'IsInt', 'IsDouble', 'IsBool'])}({rnd_operand(rng)})"
    if roll < 0.76:
        return f"not {rnd_bool(rng, depth + 1)}"
    if roll < 0.88:
        return f"({rnd_bool(rng, depth + 1)}) {rng.choice(['and', 'or'])} {rnd_bool(rng, depth + 1)}"
    return f"({rnd_bool(rng, depth + 1)})"


ADVERSARIAL_SPANS = [
    dict(attrs={"k1": "x", "num": "42", "t": "2024-03-05 14:47:30"}),
    dict(attrs={"num": "not-a-number", "t": "not a date"}, name="7"),
    dict(attrs={}),
    dict(attrs={"k1": '{"a": 1}', "num": "1e3", "t": "2024-03-05 00:00:01"},
         event_name="exception", event_attrs={"k1": "y"}),
    dict(attrs={"k1": "{broken json", "num": "-0"}, is_root=True),
    # wave 8 success paths: valid base64 / kv-pair shapes under the keys
    # the generator targets
    dict(attrs={"k1": "YWJj", "num": "k1=7 k2=9", "t": "a:1,b:2"}),
]


@pytest.mark.parametrize("seed", [1, 2])
def test_ottl_fuzz_total_functions(spark, seed):
    rng = random.Random(seed)
    policies = []
    built = tried = 0
    while built < 30 and tried < 400:
        tried += 1
        cond = rnd_bool(rng)
        mode = "propagate" if built % 2 else "ignore"
        try:
            policies.append(
                OTTLCondition(name=f"fz{built}", span_conditions=[cond], error_mode=mode)
            )
            built += 1
        except PolicyError:
            continue  # rejected at build time — the fail-to-start contract
    assert built == 30, f"generator produced too few buildable conditions ({built}/{tried})"

    from atlassian_sampling_processor_spark.aggregate import aggregate_batch, merge_with_pending
    from atlassian_sampling_processor_spark.decider import make_decision

    df = spark.createDataFrame(
        [span_row(span_id=i + 1, **s) for i, s in enumerate(ADVERSARIAL_SPANS)],
        schema=SPAN_SCHEMA,
    )
    merged = merge_with_pending(aggregate_batch(df, policies), None)
    out = make_decision(merged, policies).collect()  # must not throw (ANSI on)
    assert len(out) == 1
    for d in out[0].policy_decisions:
        assert d in (D.UNSPECIFIED, D.PENDING, D.SAMPLED), d


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_ottl_fuzz_differential_model(spark, seed):
    """Differential: the engine's compiled-Column decisions vs the
    independent Python AST interpreter (tests/ottl_model.py) with
    contrib-exact error semantics, over the adversarial rows — BOTH
    error modes per generated condition. This pins the condition-level
    ignore rule (an erroring condition contributes false even when its
    leaf-absorbed value would be true) and the propagate order rule."""
    from . import ottl_model

    rng = random.Random(seed)
    conds, policies = [], []
    built = tried = 0
    while built < 20 and tried < 400:
        tried += 1
        cond = rnd_bool(rng)
        try:
            pols = [
                OTTLCondition(
                    name=f"dm{built}_{mode}", span_conditions=[cond], error_mode=mode
                )
                for mode in ("ignore", "propagate")
            ]
        except PolicyError:
            continue
        conds.append(cond)
        policies.extend(pols)
        built += 1
    assert built == 20, f"generator produced too few buildable conditions ({built}/{tried})"

    from atlassian_sampling_processor_spark.aggregate import aggregate_batch, merge_with_pending
    from atlassian_sampling_processor_spark.decider import make_decision

    spans = [
        span_row(span_id=i + 1, start_ts=i * 100, **s)
        for i, s in enumerate(ADVERSARIAL_SPANS)
    ]
    df = spark.createDataFrame(spans, schema=SPAN_SCHEMA)
    merged = merge_with_pending(aggregate_batch(df, policies), None)
    out = make_decision(merged, policies).collect()
    assert len(out) == 1
    got = list(out[0].policy_decisions)
    for i, cond in enumerate(conds):
        asts = policies[2 * i]._span_asts
        for j, mode in enumerate(("ignore", "propagate")):
            expected = ottl_model.decide(asts, [], spans, mode)
            assert got[2 * i + j] == expected, (
                f"mode={mode} cond={cond!r}: engine={got[2 * i + j]} model={expected}"
            )


WAVE8_CONDS = [
    'Hex(attributes["k1"]) == "59574a6a"',
    'Hex(Int(attributes["num"])) != nil',
    'FNV(attributes["k1"]) > 0',
    'FNV(Concat([name, attributes["missing"]], "-")) < 0',
    'Decode(attributes["k1"], "base64") == "abc"',
    'Decode(attributes["t"], "base64") != nil',
    'Format("%s/%d", [attributes["k1"], status.code]) != nil',
    'Format("%s", [attributes["missing"]]) == "%!s(<nil>)"',
    'ParseKeyValue(attributes["num"])["k1"] == "7"',
    'ParseKeyValue(attributes["t"], ":", ",")["b"] == "2"',
    'ParseKeyValue(attributes["k1"])["x"] != nil',
    'ExtractPatterns(attributes["num"], "(?P<d>[0-9]+)")["d"] == "42"',
    'ExtractPatterns(attributes["missing"], "(?P<d>.)")["d"] == "x"',
    'ExtractPatterns(name, "(?<w>[a-z]+)")["w"] != nil',
    # wave 9
    'Sort(Split(attributes["t"], ","))[0] != nil',
    'Sort(Split(attributes["t"], ","), "desc")[1] == "b:2"',
    'Murmur3Hash(attributes["k1"]) > 0',
    'Murmur3Hash(Concat([name, attributes["missing"]], "-")) != nil',
    'ConvertCase(attributes["k1"], "snake") != nil',
    'ConvertCase(attributes["num"], "camel") == "NotANumber"',
    'UnixNano(Unix(Int(attributes["num"]))) > 0',
    'Hour(Unix(1709650050, 7)) == 14',
]


def test_ottl_wave8_differential_model(spark):
    """Every wave-8 converter through the engine AND the independent
    model on every adversarial row, both error modes — the focused
    complement to the low-probability fuzz band."""
    from . import ottl_model
    from atlassian_sampling_processor_spark.aggregate import aggregate_batch, merge_with_pending
    from atlassian_sampling_processor_spark.decider import make_decision

    policies = [
        OTTLCondition(name=f"w8d{i}_{mode}", span_conditions=[cond], error_mode=mode)
        for i, cond in enumerate(WAVE8_CONDS)
        for mode in ("ignore", "propagate")
    ]
    spans = [
        span_row(span_id=i + 1, start_ts=i * 100, **s)
        for i, s in enumerate(ADVERSARIAL_SPANS)
    ]
    df = spark.createDataFrame(spans, schema=SPAN_SCHEMA)
    merged = merge_with_pending(aggregate_batch(df, policies), None)
    out = make_decision(merged, policies).collect()
    assert len(out) == 1
    got = list(out[0].policy_decisions)
    for i, cond in enumerate(WAVE8_CONDS):
        asts = policies[2 * i]._span_asts
        for j, mode in enumerate(("ignore", "propagate")):
            expected = ottl_model.decide(asts, [], spans, mode)
            assert got[2 * i + j] == expected, (
                f"mode={mode} cond={cond!r}: engine={got[2 * i + j]} model={expected}"
            )
