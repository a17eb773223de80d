"""Parser contract tests, mirroring the reference's test strategy
(reference: tests/test_parser.py — per-production positive/negative
cases, option validation, injection blocking, Hypothesis round-trip).
"""

import pytest
from hypothesis import given
from hypothesis import strategies as st

from declarativeml_spark import ComputeKernel, DataSplit, TrainModel, parse
from declarativeml_spark.dsl import DSLSyntaxError
from declarativeml_spark.dsl.features import feature_to_spark_sql
from declarativeml_spark.dsl.ir import EvaluateModel, PredictModel
from declarativeml_spark.dsl.source import validate_source_fragment


def test_minimal_train():
    m = parse(
        "TRAIN MODEL churn USING logistic_regression FROM transactions "
        "PREDICT churned WITH FEATURES(age, income)"
    )
    assert isinstance(m, TrainModel)
    assert m.name == "churn"
    assert m.algorithm == "logistic_regression"
    assert m.params == []
    assert m.source == "transactions"
    assert m.source_is_identifier is True
    assert m.target == "churned"
    assert m.features == ["age", "income"]


def test_train_with_params():
    m = parse(
        'TRAIN MODEL m USING gbt(max_iter=10, lr=0.1, mode="fast", layers=[64, 128], '
        "cfg={a: 1, b: {c: [0.1, 0.2]}}) FROM t PREDICT y WITH FEATURES(x)"
    )
    assert m.params == [
        ("max_iter", 10),
        ("lr", 0.1),
        ("mode", "fast"),
        ("layers", [64, 128]),
        ("cfg", {"a": 1, "b": {"c": [0.1, 0.2]}}),
    ]


def test_negative_param():
    m = parse(
        "TRAIN MODEL m USING a(offset=-5, scale=-0.5) FROM t PREDICT y WITH FEATURES(x)"
    )
    assert m.params == [("offset", -5), ("scale", -0.5)]


def test_schema_qualified_source_is_fragment():
    m = parse(
        "TRAIN MODEL m USING a FROM analytics.transactions PREDICT y WITH FEATURES(x)"
    )
    assert m.source == "analytics.transactions"
    assert m.source_is_identifier is False


def test_join_source_preserved_verbatim():
    m = parse(
        "TRAIN MODEL m USING a FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_acctbal > 0 PREDICT y WITH FEATURES(x)"
    )
    assert m.source == (
        "orders o JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_acctbal > 0"
    )
    assert m.source_is_identifier is False


def test_subquery_source():
    m = parse(
        "TRAIN MODEL m USING a FROM (SELECT a, b FROM t WHERE a > 1) sub "
        "PREDICT y WITH FEATURES(x)"
    )
    assert m.source == "(SELECT a, b FROM t WHERE a > 1) sub"
    validate_source_fragment(m.source)  # must be accepted


def test_punctuated_table_name_is_identifier():
    m = parse("TRAIN MODEL m USING a FROM user-events PREDICT y WITH FEATURES(x)")
    assert m.source == "user-events"
    assert m.source_is_identifier is True


def test_keyword_inside_string_literal_survives():
    m = parse(
        "TRAIN MODEL m USING a FROM t WHERE note = 'PREDICT this' "
        "PREDICT y WITH FEATURES(x)"
    )
    assert m.source == "t WHERE note = 'PREDICT this'"


def test_feature_expressions():
    m = parse(
        "TRAIN MODEL m USING a FROM t PREDICT y "
        'WITH FEATURES(amount + tax, scale(log(amount + 1)), -cost, f(x, k=2), "lit")'
    )
    assert m.features == [
        "amount + tax",
        "scale(log(amount + 1))",
        "-cost",
        "f(x, k=2)",
        '"lit"',
    ]


def test_feature_to_spark_sql():
    assert feature_to_spark_sql("amount + tax") == "`amount` + `tax`"
    assert feature_to_spark_sql("scale(log(amount + 1))") == "scale(log(`amount` + 1))"
    assert feature_to_spark_sql("customer.age") == "`customer`.`age`"
    assert feature_to_spark_sql("(a + b) * c") == "(`a` + `b`) * `c`"


def test_split_options():
    m = parse(
        "TRAIN MODEL m USING a FROM t PREDICT y WITH FEATURES(x) "
        "SPLIT DATA training=0.7, validation=0.2, test=0.1"
    )
    assert m.split.ratios == {"training": 0.7, "validation": 0.2, "test": 0.1}


def test_split_must_sum_to_one():
    with pytest.raises(ValueError, match="sum to 1.0"):
        parse(
            "TRAIN MODEL m USING a FROM t PREDICT y WITH FEATURES(x) "
            "SPLIT DATA training=0.5, test=0.1"
        )


def test_split_ratio_range():
    with pytest.raises(ValueError, match="between 0 and 1"):
        DataSplit({"training": 1.5, "test": -0.5})


def test_validate_cv_and_all_options():
    m = parse(
        "TRAIN MODEL m USING a FROM t PREDICT y WITH FEATURES(x) "
        "VALIDATE USING cv(folds=5) OPTIMIZE FOR f1 "
        "STOP WHEN recall > 0.9 OR epochs > 100 "
        "BALANCE CLASSES BY oversampling SAVE CHECKPOINTS EVERY 10 epochs"
    )
    assert m.validate.method == "cv"
    assert m.validate.params == [("folds", 5)]
    assert m.optimize_metric == "f1"
    assert m.stop_condition == "recall > 0.9 OR epochs > 100"
    assert m.balance_method == "oversampling"
    assert m.checkpoint.interval == 10
    assert m.checkpoint.unit == "epochs"


def test_validate_on():
    m = parse(
        "TRAIN MODEL m USING a FROM t PREDICT y WITH FEATURES(x) VALIDATE ON holdout"
    )
    assert m.validate.on == "holdout"
    assert m.validate.method is None


def test_checkpoint_rejects_nonpositive():
    for bad in ["0", "-1", "2.5"]:
        with pytest.raises(ValueError, match="positive integer"):
            parse(
                f"TRAIN MODEL m USING a FROM t PREDICT y WITH FEATURES(x) "
                f"SAVE CHECKPOINTS EVERY {bad}"
            )


def test_compute_full():
    c = parse(
        "COMPUTE embed FROM table(a, b) INTO column(out) EVERY 5 TICKS "
        "USING vector_add BLOCK 128 GRID auto SHARED 64K"
    )
    assert isinstance(c, ComputeKernel)
    assert c.name == "embed"
    assert c.kernel == "vector_add"
    assert c.inputs == ["a", "b"]
    assert c.output == "out"
    assert c.schedule_ticks == 5
    assert c.options == {"BLOCK": 128, "GRID": "auto", "SHARED": "64K"}


def test_compute_minimal():
    c = parse("COMPUTE x USING k")
    assert c.inputs is None and c.output is None and c.schedule_ticks is None
    assert c.options is None


def test_compute_validations():
    with pytest.raises(ValueError, match="schedule ticks must be a positive integer"):
        parse("COMPUTE x EVERY 0 TICKS USING k")
    with pytest.raises(ValueError, match="block size must be a positive integer"):
        parse("COMPUTE x USING k BLOCK -1")
    with pytest.raises(ValueError, match="grid value must be one of: auto"):
        parse("COMPUTE x USING k GRID manual")
    with pytest.raises(ValueError, match="shared memory size"):
        parse("COMPUTE x USING k SHARED 1.5K")
    with pytest.raises(DSLSyntaxError):
        parse("COMPUTE x USING")  # kernel name required


def test_injection_rejected():
    for bad in [
        "t; DROP TABLE users",
        "t -- comment",
        "t /* comment */",
        "t WHERE 1=1 UNION SELECT * FROM secrets",
        "orders CROSS JOIN (DELETE FROM x) d ON 1=1",
    ]:
        with pytest.raises(ValueError):
            validate_source_fragment(bad)


def test_join_using_accepted():
    # Deliberate divergence from the reference validator (SURVEY §2.4):
    # its docs use USING (DSL.md:398) but its regex only allowed ON.
    validate_source_fragment("orders JOIN customer USING (custkey)")


def test_predict_statement():
    p = parse(
        "PREDICT USING MODEL churn FROM new_customers "
        "STORE RESULTS IN churn_predictions WITH BATCH_SIZE 1000"
    )
    assert isinstance(p, PredictModel)
    assert p.model == "churn"
    assert p.source == "new_customers"
    assert p.sink == "churn_predictions"
    assert p.batch_size == 1000


def test_evaluate_statement():
    e = parse("EVALUATE MODEL churn ON holdout METRICS (accuracy, f1)")
    assert isinstance(e, EvaluateModel)
    assert e.model == "churn"
    assert e.source == "holdout"
    assert e.metrics == ["accuracy", "f1"]


def test_syntax_errors():
    for bad in ["TRAIN MODEL", "TRAIN MODEL m USING", "nonsense", ""]:
        with pytest.raises((DSLSyntaxError, ValueError)):
            parse(bad)


_ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s.upper()
    not in {
        "TRAIN", "MODEL", "USING", "FROM", "PREDICT", "WITH", "FEATURES",
        "SPLIT", "DATA", "VALIDATE", "ON", "OPTIMIZE", "FOR", "STOP", "WHEN",
        "BALANCE", "CLASSES", "BY", "SAVE", "CHECKPOINTS", "EVERY", "AND", "OR",
    }
)


@given(name=_ident, alg=_ident, source=_ident, target=_ident, feat=_ident)
def test_roundtrip_property(name, alg, source, target, feat):
    m = parse(
        f"TRAIN MODEL {name} USING {alg} FROM {source} "
        f"PREDICT {target} WITH FEATURES({feat})"
    )
    assert m.name == name
    assert m.algorithm == alg
    assert m.source == source
    assert m.target == target
    assert m.features == [feat]


@given(
    source=_ident,
    n=st.integers(min_value=1, max_value=10_000),
    idc=_ident,
)
def test_shard_roundtrip_property(source, n, idc):
    s = parse(f"SHARD {source} INTO {n} SHARDS BY {idc}")
    assert s.source == source
    assert s.n_shards == n
    assert s.id_column == idc


@given(
    source=_ident,
    target=st.integers(min_value=1, max_value=10**12),
    part=_ident,
    fid=_ident,
    sz=_ident,
)
def test_compact_roundtrip_property(source, target, part, fid, sz):
    c = parse(
        f"COMPACT {source} TARGET {target} BYTES"
        f" PARTITION BY {part} FILE BY {fid} SIZE BY {sz}"
    )
    assert c.source == source
    assert c.target_bytes == target
    assert (c.part_column, c.file_column, c.bytes_column) == (part, fid, sz)


# -- crash-freedom fuzz ----------------------------------------------------
# The parser's error contract: EVERY input either parses to an IR node
# or raises DSLSyntaxError/ValueError — never an AttributeError /
# IndexError / RecursionError escape from lexer internals. (The
# reference compiles via a Lark grammar which guarantees this shape;
# the hand-written recursive-descent parser here has to earn it.)

_STATEMENT_HEADS = [
    "TRAIN MODEL", "COMPUTE", "PREDICT USING MODEL", "DEPLOY MODEL",
    "CREATE FEATURE TRANSFORMER", "WHEN", "CREATE AGENT",
    "CREATE ENSEMBLE", "EXPLAIN PREDICTION", "MONITOR MODEL",
    "RETRAIN", "REGISTER AGENT", "PUBLISH EVENT", "SUBSCRIBE TO",
    "WAIT FOR EVENT", "SHARD", "COMPACT", "DEDUPLICATE", "WEIGH",
    "SCORE QUALITY", "SEARCH SIMILAR", "QUANTIZE EMBEDDINGS",
    "DECONTAMINATE", "PACK", "SAMPLE",
]


@given(st.text(max_size=120))
def test_fuzz_arbitrary_text_never_crashes(s):
    try:
        parse(s)
    except (DSLSyntaxError, ValueError):
        pass  # the contract: typed errors only


@given(
    head=st.sampled_from(_STATEMENT_HEADS),
    tail=st.text(
        alphabet=st.characters(
            whitelist_categories=["Lu", "Ll", "Nd", "Po", "Ps", "Pe", "Sm", "Zs"]
        ),
        max_size=80,
    ),
)
def test_fuzz_statement_heads_never_crash(head, tail):
    """Partial/mangled statements behind every real statement head
    still fail typed — the shapes a user actually mistypes."""
    try:
        parse(f"{head} {tail}")
    except (DSLSyntaxError, ValueError):
        pass


@given(
    stmt=st.sampled_from([
        "TRAIN MODEL m USING alg FROM t PREDICT y WITH FEATURES(a, b)",
        "SHARD docs INTO 16 SHARDS BY doc_id",
        "WEIGH documents AGAINST 'src0' ON source BUCKETS 512",
    ]),
    pos=st.integers(min_value=0, max_value=60),
    ins=st.sampled_from(["(", ")", ",", "'", ";", " FROM ", "\x00", "99", " "]),
)
def test_fuzz_single_mutation_never_crashes(stmt, pos, ins):
    p = min(pos, len(stmt))
    mutated = stmt[:p] + ins + stmt[p:]
    try:
        parse(mutated)
    except (DSLSyntaxError, ValueError):
        pass


# --- round-10 parser review-sweep regressions --------------------------------


def test_split_statements_comment_aware():
    from declarativeml_spark.dsl.parser import parse_script, split_statements

    assert len(parse_script("SET a.b = 1; -- done")) == 1
    # the second chunk keeps its leading comment text (the lexer
    # skips comments) — the point is the ';' inside the comment no
    # longer splits, and the chunk still parses
    stmts = split_statements("SET a.b = 1; -- note; careful\nSET c.d = 2")
    assert len(stmts) == 2 and stmts[1].endswith("SET c.d = 2")
    assert len(parse_script("SET a.b = 1; -- note; careful\nSET c.d = 2")) == 2
    # a quoted '--' is NOT a comment
    assert len(parse_script("PUBLISH EVENT e WITH PAYLOAD {x: 'a--b; c'}")) == 1


def test_source_capture_is_paren_aware():
    from declarativeml_spark.dsl.parser import parse

    r = parse(
        "PREDICT USING MODEL m FROM (WITH t AS (SELECT 1 AS x)"
        " SELECT * FROM t) s STORE RESULTS IN out"
    )
    assert r.source.startswith("(WITH t AS") and r.sink == "out"


def test_when_metric_sugar_model_prefix_scopes_rule():
    from declarativeml_spark.dsl.parser import parse

    scoped = parse(
        "WHEN fraud_detector.accuracy < 0.85 THEN RETRAIN MODEL fraud_detector"
    )
    assert "'$.model') = 'fraud_detector'" in scoped.payload_predicate
    generic = parse("WHEN model_metrics.accuracy < 0.85 THEN RETRAIN MODEL m")
    assert "$.model" not in generic.payload_predicate


def test_monitor_unitless_every_before_check():
    from declarativeml_spark.dsl.parser import parse

    r = parse("MONITOR MODEL m ON events EVERY 10 CHECK (accuracy > 0.8)")
    assert r.every == 10 and r.every_unit is None
    assert r.checks == ["accuracy > 0.8"]


def test_unitless_checkpoint_before_next_option():
    from declarativeml_spark.dsl.parser import parse

    r = parse(
        "TRAIN MODEL x USING logistic_regression FROM t PREDICT y"
        " WITH FEATURES(a, b)"
        " SAVE CHECKPOINTS EVERY 1000 STOP WHEN accuracy > 0.9"
    )
    assert r.checkpoint.interval == 1000 and r.checkpoint.unit is None
    assert r.stop_condition == "accuracy > 0.9"


def test_action_chain_keeps_statement_internal_and():
    from declarativeml_spark.dsl.parser import parse

    r = parse(
        "WHEN MODEL m ACCURACY > 0.9 THEN EVALUATE MODEL m ON events"
        " WHERE x = 1 AND y = 2 METRICS (accuracy)"
    )
    assert "AND y = 2" in r.action
    # a genuine chain still splits
    r2 = parse(
        "WHEN MODEL m ACCURACY > 0.9 THEN DEPLOY TO prod"
        " AND ARCHIVE previous_version"
    )
    assert "; " in r2.action


def test_when_model_and_subscribe_accept_begin_blocks():
    from declarativeml_spark.dsl.parser import parse

    r = parse("WHEN MODEL m ACCURACY > 0.9 THEN BEGIN RETRAIN MODEL m; END")
    assert r.action.startswith("BEGIN")
    r2 = parse("SUBSCRIBE TO 'model.*' EXECUTE BEGIN RETRAIN MODEL m; END")
    assert r2.action.startswith("BEGIN")
    with pytest.raises(DSLSyntaxError, match="only THEN"):
        parse(
            "WHEN MODEL m ACCURACY > 0.9 THEN DEPLOY TO prod"
            " AND BEGIN RETRAIN MODEL m; END"
        )


def test_alias_qualified_payload_accessor():
    from declarativeml_spark.dsl.parser import parse

    r = parse("WHEN EVENT 'm' WHERE e.payload->>'k' = 'v' THEN RETRAIN MODEL m")
    assert r.payload_predicate == "get_json_object(payload, '$.k') = 'v'"
    # a column merely ENDING in payload is untouched
    r2 = parse(
        "WHEN EVENT 'm' WHERE event_payload = 'x' THEN RETRAIN MODEL m"
    )
    assert r2.payload_predicate == "event_payload = 'x'"


def test_feature_expr_accepts_single_quoted_strings():
    """SQL-style single-quoted strings ('' escaping) are the DSL's own
    idiomatic string syntax and must parse in feature expressions like
    everywhere else in the statement grammar (review r11)."""
    from declarativeml_spark.dsl.features import (
        StringLit,
        parse_feature_expr,
    )

    ast = parse_feature_expr("coalesce(country, 'unknown')")
    assert StringLit("unknown") in ast.args
    esc = parse_feature_expr("label_of('it''s')")
    assert esc.args[0] == StringLit("it's")
    # double-quoted form still parses to the same literal
    assert parse_feature_expr('coalesce(country, "unknown")').args[1] == (
        StringLit("unknown")
    )


def test_all_columns_alias_backtick_quoted():
    """alias.* renders with backtick-quoted parts like every other
    identifier — a keyword-named alias must not break only in the
    .* form (review r11)."""
    from declarativeml_spark.dsl.features import parse_feature_expr

    ast = parse_feature_expr("f(order.*)")
    assert ast.args[0].to_spark_sql() == "struct(`order`.*)"


def test_forecast_ir_rejects_nonpositive_horizon():
    """Direct IR construction enforces the parser's positive-horizon
    invariant — a bad horizon must not fail only AFTER a full model
    fit (review r11)."""
    from declarativeml_spark.dsl import ir

    for bad in (0, -3):
        with pytest.raises(ValueError, match="horizon"):
            ir.ForecastModel(
                name="f", algorithm="auto", params=[], source="orders",
                target="y", time_column="d", horizon=bad,
            )
    ir.ForecastModel(
        name="f", algorithm="auto", params=[], source="orders",
        target="y", time_column="d", horizon=1,
    )


def test_source_validator_linear_on_repeated_joins():
    """The reference's relation regex backtracks exponentially on
    repeated non-matching JOIN...ON segments (20 joins took ~6 s; ~30
    pinned a core for hours) — the tempered ON-condition class must
    reject in linear time while accepting every legitimate shape."""
    import time

    from declarativeml_spark.dsl.source import validate_source_fragment

    attack = "a" + " JOIN b ON x = y" * 60 + " ,"
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="relation/join"):
        validate_source_fragment(attack)
    assert time.perf_counter() - t0 < 0.5
    # legitimate joins (incl. identifiers CONTAINING join words) pass
    validate_source_fragment(
        "a JOIN b ON a.x = b.y JOIN c ON b.z = c.w"
        " WHERE a.left_val > 1 GROUP BY a.x LIMIT 5"
    )
    validate_source_fragment("t1 JOIN t2 ON t1.inner_id = t2.full_id")


def test_lexer_sql_operator_passthrough_and_dangling_exponent():
    """Subquery sources may carry ||/&/~ (the validator's passthrough
    contract — the lexer used to die with 'Unexpected character');
    a dangling exponent errors at the lexeme instead of silently
    splitting into NUMBER + NAME."""
    from declarativeml_spark.dsl import parse
    from declarativeml_spark.dsl.lexer import DSLSyntaxError, tokenize

    stmt = parse(
        "TRAIN MODEL m USING linear_regression FROM"
        " (SELECT a || b AS ab, v FROM t) s PREDICT v WITH FEATURES(v)"
    )
    assert "||" in stmt.source
    toks = tokenize("a || b")
    assert [t.value for t in toks[:-1]] == ["a", "||", "b"]
    with pytest.raises(DSLSyntaxError, match="Malformed number"):
        tokenize("epochs=1e")
    # valid exponents and the COMPUTE size suffixes still lex
    assert tokenize("1e5")[0].value == "1e5"
    assert [t.value for t in tokenize("64K")[:-1]] == ["64", "K"]
