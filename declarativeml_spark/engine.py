"""Engine facade: execute DSL statements against a SparkSession.

The reference's executable surface is ``python -m dsl.cli`` → SQL
text for PostgreSQL to run (reference: dsl/cli.py:14-46). Our engine
executes directly: parse → IR → plan build → Spark action. One class,
one ``execute`` entry point, statement-type dispatch.
"""

from __future__ import annotations

from typing import Any, Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from declarativeml_spark.dsl import ir
from declarativeml_spark.dsl.parser import parse
from declarativeml_spark.ml.models import registry_load
from declarativeml_spark.ml.training import TrainedModel, train
from declarativeml_spark.plans.builder import resolve_source


class ForeignRegistryTableError(ValueError):
    """A table occupies the index-registry name but is not the
    registry (wrong schema). Raised instead of reading or overwriting
    it; paths that merely WOULD have consulted the registry (session
    -only drops/rebuilds) treat it as 'no registry exists'."""


class Engine:
    def __init__(self, spark: SparkSession, model_dir: Optional[str] = None):
        self.spark = spark
        self.model_dir = model_dir
        self._bus = None
        self.agents: dict[str, ir.Agent] = {}
        # hyperparameter-search agents (CREATE AGENT … SEARCH SPACE);
        # registration stores the spec, run_tuner executes the search
        self.tuners: dict[str, ir.TunerAgent] = {}
        # learned BPE merge tables by tokenizer name (TRAIN TOKENIZER)
        self.tokenizers: dict[str, DataFrame] = {}
        # tokenizer name → its STORED AS merge table (durable form)
        self.tokenizer_tables: dict[str, str] = {}
        # named composite types (CREATE TYPE) → Spark StructType
        self.types: dict[str, Any] = {}
        # host-registered procedures for CALL / SUBSCRIBE … EXECUTE
        # PROCEDURE (AGENTS.md:49-51): name → callable(engine)
        self.procedures: dict[str, Any] = {}
        # trend-agent metric histories (README.md:60-63 agents)
        self._trend_history: dict[str, list] = {}
        # advisory retraining schedules (SCHEDULE retraining IN n unit)
        self.retrain_schedules: dict[str, dict] = {}
        # persisted similarity indexes by name (CREATE INDEX) — each a
        # dict of {method, source, params, frames, owned, tables}; the
        # owned frames outlive statement scopes until DROP INDEX
        self.indexes: dict[str, dict] = {}
        # storage tables THIS session's CREATE INDEX wrote: only these
        # may be silently cleaned on rebuild — anything else of the
        # same name is presumed user data and errors instead
        self._created_storage: set[str] = set()
        # DataFrames persisted by the PREVIOUS statement's operators
        # (dedup/ANN cache LSH tables, normed bases, …). Released when
        # the next statement starts, or explicitly via release() — so a
        # long-lived session's storage memory is bounded by one
        # statement's working set instead of growing until LRU pressure.
        self._persisted: list[DataFrame] = []

    def release(self) -> None:
        """Unpersist every DataFrame cached by the last statement.

        Safe at any time: results built on those frames lazily
        recompute from source if re-collected afterwards.
        """
        from declarativeml_spark.operators.caching import release_all

        release_all(self._persisted)

    @property
    def bus(self):
        """Lazily-created event bus; WHEN rules and agents attach here."""
        if self._bus is None:
            from declarativeml_spark.streaming.events import EventBus

            self._bus = EventBus(self.spark)
        return self._bus

    def execute_script(self, text: str) -> list:
        """Run a multi-statement script (``;``-separated, quote-aware
        — see ``dsl.parser.split_statements``); returns one result per
        statement, in order."""
        from declarativeml_spark.dsl.parser import split_statements

        return [self.execute(stmt) for stmt in split_statements(text)]

    def execute(self, text: str) -> Union[TrainedModel, DataFrame, dict]:
        from declarativeml_spark.operators.caching import capture

        # one cache scope per statement: drop the previous statement's
        # operator persists, collect this one's for the next release.
        # The finally-extend (not assign) matters twice: a statement
        # failing AFTER its operator persisted frames must still hand
        # them to the next release(), and a re-entrant execute (a
        # WHEN-rule action firing inside PUBLISH EVENT) must not have
        # its frames overwritten by the outer call's list.
        self.release()
        with capture() as frames:
            try:
                out = self._execute(text)
            finally:
                self._persisted.extend(frames)
        return out

    def _execute(self, text: str) -> Union[TrainedModel, DataFrame, dict]:
        stmt = parse(text)
        if isinstance(stmt, ir.TrainModel):
            trained = train(
                self.spark, stmt, model_dir=self.model_dir, statement=text
            )
            self._publish_converged(trained)
            return trained
        if isinstance(stmt, ir.ComputeKernel):
            from declarativeml_spark.functions.kernels import execute_compute

            return execute_compute(stmt)
        if isinstance(stmt, ir.PredictModel):
            return self._predict(stmt)
        if isinstance(stmt, ir.EvaluateModel):
            return self._evaluate(stmt)
        if isinstance(stmt, ir.FeatureTransformer):
            return self._feature_transformer(stmt)
        if isinstance(stmt, ir.Ensemble):
            from declarativeml_spark.ml.ensemble import create_ensemble

            record = create_ensemble(
                self.spark, stmt.name, stmt.models, stmt.method, base=self.model_dir
            )
            if stmt.validate_on:
                # the parsed VALIDATE ON clause was previously dropped
                # on the floor — the user believed the ensemble was
                # scored on the holdout while nothing ran
                record["validation_metrics"] = self._validate_ensemble(
                    stmt.models, stmt.validate_on
                )
            return record
        if isinstance(stmt, ir.DeployModel):
            from declarativeml_spark.ml.ensemble import deploy_model

            return deploy_model(
                self.spark, stmt.model, stmt.version, stmt.config, base=self.model_dir
            )
        if isinstance(stmt, ir.DeployABTest):
            return self._deploy_ab(stmt)
        if isinstance(stmt, ir.MonitorModel):
            return self._monitor(stmt)
        if isinstance(stmt, ir.RetrainModel):
            from declarativeml_spark.ml.models import version_statuses

            retrained = self._retrain(stmt)
            # a rolled-back retrain did NOT produce a serving model —
            # announcing convergence would trigger deploy rules on it
            rolled = (
                version_statuses(retrained.name, self.model_dir).get(
                    retrained.version
                )
                == "rolled_back"
            )
            if not rolled:
                self._publish_converged(retrained)
            return retrained
        if isinstance(stmt, ir.WhenRule):
            return self._register_rule(stmt)
        if isinstance(stmt, ir.Agent):
            return self._register_agent(stmt)
        if isinstance(stmt, ir.TunerAgent):
            return self._register_tuner(stmt)
        if isinstance(stmt, ir.TrendAgent):
            return self._register_trend_agent(stmt)
        if isinstance(stmt, ir.ScheduleRetraining):
            return self._schedule_retraining(stmt)
        if isinstance(stmt, ir.ForecastModel):
            from declarativeml_spark.ml.forecast import train_forecast

            trained, forecast_df = train_forecast(
                self.spark, stmt, model_dir=self.model_dir
            )
            trained.forecast = forecast_df  # type: ignore[attr-defined]
            return trained
        if isinstance(stmt, ir.ExplainPrediction):
            return self._explain(stmt)
        if isinstance(stmt, ir.RegisterAgent):
            return self._register_agent_catalog(stmt)
        if isinstance(stmt, ir.PublishEvent):
            self.bus.publish(stmt.event_type, stmt.payload)
            # deliver immediately so WHEN rules react in-session
            return self.bus.dispatch_batch()
        if isinstance(stmt, ir.Deduplicate):
            return self._deduplicate(stmt)
        if isinstance(stmt, ir.SimilaritySearch):
            return self._similarity_search(stmt)
        if isinstance(stmt, ir.SampleCorpus):
            return self._sample(stmt)
        if isinstance(stmt, ir.Decontaminate):
            return self._decontaminate(stmt)
        if isinstance(stmt, ir.PackSequences):
            return self._pack(stmt)
        if isinstance(stmt, ir.RedactPII):
            return self._redact(stmt)
        if isinstance(stmt, ir.ChunkWindows):
            return self._chunk(stmt)
        if isinstance(stmt, ir.Sessionize):
            return self._sessionize(stmt)
        if isinstance(stmt, ir.QuantizeEmbeddings):
            return self._quantize(stmt)
        if isinstance(stmt, ir.MixCorpus):
            return self._mix(stmt)
        if isinstance(stmt, ir.ProfileTable):
            return self._profile(stmt)
        if isinstance(stmt, ir.DetectAnomalies):
            return self._detect_anomalies(stmt)
        if isinstance(stmt, ir.ShardCorpus):
            return self._shard(stmt)
        if isinstance(stmt, ir.CompactTable):
            return self._compact(stmt)
        if isinstance(stmt, ir.ShuffleCorpus):
            return self._shuffle(stmt)
        if isinstance(stmt, ir.ScoreQuality):
            return self._score_quality(stmt)
        if isinstance(stmt, ir.WeighCorpus):
            return self._weigh(stmt)
        if isinstance(stmt, ir.AuditAnonymity):
            return self._audit_anonymity(stmt)
        if isinstance(stmt, ir.CalibrateDedup):
            return self._calibrate_dedup(stmt)
        if isinstance(stmt, ir.TrainTokenizer):
            return self._train_tokenizer(stmt)
        if isinstance(stmt, ir.Tokenize):
            return self._tokenize(stmt)
        if isinstance(stmt, ir.DropTokenizer):
            return self._drop_tokenizer(stmt)
        if isinstance(stmt, ir.DecodeMedia):
            return self._decode_media(stmt)
        if isinstance(stmt, ir.SampleFrames):
            return self._sample_frames(stmt)
        if isinstance(stmt, ir.ResizeMedia):
            return self._resize_media(stmt)
        if isinstance(stmt, ir.LoadMedia):
            return self._load_media(stmt)
        if isinstance(stmt, ir.CreateIndex):
            return self._create_index(stmt)
        if isinstance(stmt, ir.DropIndex):
            return self._drop_index(stmt)
        if isinstance(stmt, ir.RefreshIndex):
            return self._refresh_index(stmt)
        if isinstance(stmt, ir.SelectFunction):
            return self._select_function(stmt)
        if isinstance(stmt, ir.CreateType):
            return self._create_type(stmt)
        if isinstance(stmt, ir.Notify):
            self.bus.publish(
                "notification",
                {"recipient": stmt.target, "message": stmt.message},
            )
            self.bus.dispatch_batch()  # deliver to WHEN-rules in-session
            return {"notified": stmt.target, "message": stmt.message}
        if isinstance(stmt, ir.ArchiveVersion):
            return self._archive_version(stmt)
        if isinstance(stmt, ir.SetConfig):
            # the reference's extension configuration → session conf
            self.spark.conf.set(stmt.key, str(stmt.value))
            return {"set": stmt.key, "value": stmt.value}
        if isinstance(stmt, ir.CallProcedure):
            fn = self.procedures.get(stmt.name)
            if fn is None:
                raise ValueError(
                    f"Unknown procedure {stmt.name!r}; register one with"
                    " Engine.register_procedure(name, fn) — registered:"
                    f" {', '.join(sorted(self.procedures)) or 'none'}"
                )
            return fn(self)
        raise ValueError(f"Unsupported statement: {type(stmt).__name__}")

    def _search_from_index(
        self, stmt: "ir.SimilaritySearch", p: dict, k: int
    ) -> DataFrame:
        """``SEARCH SIMILAR [source] USING INDEX name[(params)]`` —
        serve from a CREATE INDEX snapshot: only the probe stages run
        (no Lloyd's / no bucket-key build). Search-time knobs only:
        ivf takes query_mod/n_probe, lsh takes threshold."""
        from declarativeml_spark.operators import dedup as D

        rec = self.indexes.get(stmt.index) or self._adopt_stored_index(
            stmt.index
        )
        if rec is None:
            raise ValueError(
                f"Unknown index {stmt.index!r}; build it first with"
                " CREATE INDEX"
            )
        if stmt.source and stmt.source != rec["source"]:
            raise ValueError(
                f"Index {stmt.index!r} was built on {rec['source']!r},"
                f" not {stmt.source!r} — the index serves its own"
                " snapshot; CREATE INDEX on the new source instead"
            )
        if rec["method"] == "ivf":
            allowed = {"query_mod", "n_probe"}
            unknown = sorted(set(p) - allowed)
            if unknown:
                raise ValueError(
                    "SEARCH SIMILAR USING INDEX (ivf) does not accept"
                    f" option(s) {', '.join(unknown)}; accepted:"
                    f" {', '.join(sorted(allowed))} (build-time options"
                    " belong on CREATE INDEX)"
                )
            return D.ivf_probe_topk(
                rec["frames"]["corpus"], rec["frames"]["cents"], k=k, **p
            )
        allowed = {"threshold"}
        unknown = sorted(set(p) - allowed)
        if unknown:
            raise ValueError(
                "SEARCH SIMILAR USING INDEX (lsh) does not accept"
                f" option(s) {', '.join(unknown)}; accepted: threshold"
                " (build-time options belong on CREATE INDEX)"
            )
        out = D.lsh_pairs_from_index(rec["frames"]["keyed"], **p)
        if stmt.k is not None:
            # honor an explicit TOP exactly like the direct lsh path:
            # the k closest pairs, deterministic tiebreak
            out = out.orderBy(
                F.col("euclidean_dist").asc(),
                F.col("id_a").asc(),
                F.col("id_b").asc(),
            ).limit(stmt.k)
        return out

    # -- CREATE INDEX / DROP INDEX (beyond-parity, SURVEY §7.5) --------------
    def _create_index(self, stmt: "ir.CreateIndex") -> DataFrame:
        """Build a similarity index once, materialize it, and keep it
        across statements so repeated ``SEARCH SIMILAR … USING INDEX``
        runs only the probe stages.

        * ``ivf``: the pinned-Lloyd cell assignment (persisted corpus,
          checkpointed centroids — operators/dedup.py::native_cells).
        * ``lsh``: the banded bucket table (persisted, materialized —
          operators/dedup.py::lsh_keyed_index).

        The built frames are adopted OUT of the per-statement cache
        scope (caching.adopt_since), so the engine's next-statement
        release leaves them cached; DROP INDEX (or a rebuilding
        CREATE INDEX of the same name) frees them. The index is a
        snapshot of the source at build time — rebuild after the
        source changes.
        """
        from declarativeml_spark.operators import caching

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        p = dict(stmt.params)
        id_col = p.pop("id_col", "vec_id")
        vec_col = p.pop("vec_col", "embedding")
        # Validate the method's option surface FIRST: a CREATE INDEX
        # that is going to fail must leave an existing same-name index
        # (and its durable storage tables) untouched.
        if stmt.method == "ivf":
            allowed = {"n_cells", "n_iters", "dim"}
        else:  # lsh (ir validates the method set)
            allowed = {
                "bucket_length",
                "num_hash_tables",
                "projs_per_table",
                "seed",
                "dim",
            }
        unknown = sorted(set(p) - allowed)
        if unknown:
            raise ValueError(
                f"CREATE INDEX USING {stmt.method} does not accept option(s)"
                f" {', '.join(unknown)}; accepted:"
                f" {', '.join(sorted(allowed | {'id_col', 'vec_col'}))}"
            )
        import os
        import shutil

        storage_targets: list[str] = []
        wh = ""
        if stmt.stored_as is not None:
            t = stmt.stored_as
            if t == self.INDEX_REGISTRY_TABLE:
                raise ValueError(
                    f"STORED AS target {t!r} is the engine's index"
                    " registry table — pick another name"
                )
            storage_targets = [t] + (
                [f"{t}_centroids"] if stmt.method == "ivf" else []
            )
            wh = self._warehouse_path()
            # Availability checks run BEFORE the same-name index is
            # released, so a failing statement never destroys the
            # working one. A pre-existing table we don't own is NEVER
            # silently dropped: it could be user data, the index's own
            # source, another live index's storage — or a live
            # tokenizer's merge table (both artifact kinds share
            # _created_storage, so session ownership alone is NOT
            # permission to clean).
            if stmt.name not in self.indexes:
                # an idempotent re-run in a FRESH session: a prior
                # session's registry row plus ownership marks prove an
                # existing STORED AS target is this index's OWN
                # storage, adoptable for rebuild rather than refused
                # as a squatter. Adoption failures fall through to the
                # availability checks below (missing storage → plain
                # rebuild; unmarked/misshapen table → refused, never
                # dropped).
                try:
                    self._adopt_stored_index(stmt.name)
                except ValueError:
                    pass
            old_tables = frozenset(
                (self.indexes.get(stmt.name) or {}).get("tables", ())
            )
            other_tables = {
                tbl: nm
                for nm, rec in self.indexes.items()
                if nm != stmt.name
                for tbl in rec.get("tables", ())
            }
            tokenizer_owned = {
                tbl: nm for nm, tbl in self.tokenizer_tables.items()
            }
            for target in storage_targets:
                loc = os.path.join(wh, target.lower())
                if target in other_tables:
                    raise ValueError(
                        f"STORED AS target {target!r} belongs to live"
                        f" index {other_tables[target]!r} — pick another"
                        " name or drop that index first"
                    )
                if target in tokenizer_owned:
                    raise ValueError(
                        f"STORED AS target {target!r} belongs to tokenizer"
                        f" {tokenizer_owned[target]!r} — pick another name"
                        " or drop that tokenizer first"
                    )
                if target in old_tables or target in self._created_storage:
                    # the same-name index's own storage (released just
                    # below) or a leftover from this session's earlier
                    # failed build: safe to clean
                    continue
                if self.spark.catalog.tableExists(target):
                    raise ValueError(
                        f"STORED AS target {target!r} already exists and"
                        f" does not belong to index {stmt.name!r} — pick"
                        " another name or drop the table first"
                    )
                if os.path.isdir(loc):
                    raise ValueError(
                        f"STORED AS target location {loc!r} already"
                        " exists (orphaned by a previous session?) —"
                        " remove it or pick another name"
                    )
            # Registry writability is an availability check too: the
            # closing _upsert_index_registry must not be the FIRST
            # place a foreign-shaped squatter on the registry name
            # surfaces — by then the old index and its tables are
            # gone and the except-path tears the new build down with
            # them. _read_index_registry raises
            # ForeignRegistryTableError on a foreign shape and is
            # cheap otherwise (no-op table miss or a handful of rows).
            self._read_index_registry()
            # All checks passed. Release the same-name index NOW — its
            # DROP of the shared storage tables must run before, never
            # after, the new write (releasing afterwards would delete
            # the tables just written) — then clean session leftovers.
            old = self.indexes.pop(stmt.name, None)
            if old is not None:
                self._release_index(old)
            for target in storage_targets:
                if target in self._created_storage:
                    self.spark.sql(f"DROP TABLE IF EXISTS {target}")
                    loc = os.path.join(wh, target.lower())
                    if os.path.isdir(loc):
                        shutil.rmtree(loc, ignore_errors=True)
            self._created_storage.update(storage_targets)
        mark = caching.scope_mark()
        try:
            frames, tables, n_rows, owned = self._build_index_frames(
                stmt, df, p, id_col, vec_col, mark
            )
        except BaseException:
            # a failed build must not leave the STORED AS names marked
            # session-owned (a user table created under the name later
            # would be silently dropped by the next same-target CREATE
            # INDEX) nor leak partially-written storage or adopted
            # caches
            caching.release_all(caching.adopt_since(mark))
            # empty shape sets: these names are this statement's own
            # (validated above), reclaim unconditionally
            self._reclaim_storage({t: set() for t in storage_targets})
            if stmt.stored_as is not None:
                # the same-name index (and its tables) was released
                # before the build — a surviving registry row would
                # point at dropped tables and poison later adoption
                try:
                    self._remove_index_registry(stmt.name)
                except Exception:  # noqa: BLE001 — keep the build error
                    pass
            raise
        old = self.indexes.pop(stmt.name, None)
        if old is not None:
            self._release_index(old)
        self.indexes[stmt.name] = {
            "method": stmt.method,
            "source": stmt.source,
            "source_is_identifier": stmt.source_is_identifier,
            "params": dict(stmt.params),
            "frames": frames,
            "owned": owned,
            "tables": tables,
        }
        # keep the cross-session registry in step: a STORED AS index
        # records itself (so a fresh Engine can adopt it); a rebuild
        # that dropped a previously-stored same-name index must not
        # leave a stale row pointing at dropped tables
        try:
            if stmt.stored_as is not None:
                self._upsert_index_registry(stmt.name, stmt, tables)
            else:
                # a non-stored rebuild must clear ANY same-name row —
                # including a prior SESSION's (old is None then): the
                # in-memory index shadows it now, and leaving the row
                # would resurrect the stale stored snapshot after the
                # next restart. The row's now-ownerless stored tables
                # are reclaimed with it (shape-guarded), or they would
                # leak in the warehouse with no DSL path left to free
                # them. No-op when no row (or no real registry) exists.
                # One exception: never drop a reclaimed table the NEW
                # index was just built FROM (CREATE INDEX i ON idx_t
                # where idx_t is i's prior stored storage) — the fresh
                # frames' lineage roots at that table, and reclaiming
                # it would fail every later search on the first cache
                # eviction. The row still goes; the table survives as
                # an ordinary user-visible table.
                keep = (
                    frozenset({stmt.source.lower()})
                    if stmt.source_is_identifier
                    else frozenset()
                )
                self._reclaim_registry_row(stmt.name, keep=keep)
        except BaseException:
            self._release_index(self.indexes.pop(stmt.name))
            raise
        return self.spark.createDataFrame(
            [(stmt.name, stmt.method, stmt.source, int(n_rows))],
            "index_name string, method string, source string, indexed_rows long",
        )

    # -- REFRESH INDEX (incremental maintenance, SURVEY §7.5) ----------------
    def _refresh_index(self, stmt: "ir.RefreshIndex") -> DataFrame:
        """Incremental index maintenance (the dedup_incremental_delta
        pattern applied to the index): re-read the source, anti-join
        out already-indexed ids, assign ONLY the new rows to the
        existing structure, and append.

        * ``lsh``: bucket keys are a deterministic function of the
          vector (seeded projections), so refresh == cold rebuild on
          the unioned source, exactly.
        * ``ivf``: new vectors assign to the FROZEN centroids
          (operators/dedup.py::assign_cells — one broadcast argmin,
          no shuffle); the quantizer never moves. Centroid drift
          warrants CREATE INDEX, not REFRESH (documented trade).
        * ``STORED AS`` indexes append to the bucketed table with the
          same bucket spec, so the candidate join stays co-located —
          no exchange creeps in as the index grows.
        """
        from declarativeml_spark.operators import caching
        from declarativeml_spark.operators import dedup as D
        from declarativeml_spark.sources.io import save_bucketed_table

        rec = self.indexes.get(stmt.name) or self._adopt_stored_index(
            stmt.name
        )
        if rec is None:
            raise ValueError(
                f"Unknown index {stmt.name!r}; build it first with"
                " CREATE INDEX"
            )
        df = resolve_source(
            self.spark, rec["source"], rec.get("source_is_identifier", True)
        )
        p = dict(rec["params"])
        id_col = p.pop("id_col", "vec_id")
        vec_col = p.pop("vec_col", "embedding")
        mark = caching.scope_mark()
        if rec["method"] == "ivf":
            corpus, cents = rec["frames"]["corpus"], rec["frames"]["cents"]
            indexed = corpus.select("vec_id")
            new = df.join(
                indexed, df[id_col] == indexed["vec_id"], "left_anti"
            )
            assigned = D.assign_cells(
                new, cents, id_col, vec_col, dim=int(p.get("dim", 64))
            )
            if rec["tables"]:
                t = rec["tables"][0]
                # persist the delta: the count below and the bucketed
                # write would otherwise each run the source re-read +
                # anti-join + assignment end to end (scope-released
                # after the statement)
                assigned = caching.track_persist(assigned)
                n_new = assigned.count()
                if n_new:
                    save_bucketed_table(assigned, t, "cell", mode="append")
                rec["frames"] = {
                    "corpus": self.spark.table(t),
                    "cents": cents,
                }
            else:
                n_old = corpus.count()  # BEFORE the old generation's
                # checkpoint blocks are released by the union swap
                union = self._checkpoint_refresh_union(
                    rec, corpus.unionByName(assigned)
                )
                n_new = union.count() - n_old
                caching.release_all(rec["owned"])
                rec["owned"] = caching.adopt_since(mark)
                rec["frames"] = {"corpus": union, "cents": cents}
            total = rec["frames"]["corpus"].count()
        else:  # lsh
            keyed = rec["frames"]["keyed"]
            indexed = keyed.select("vec_id").distinct()
            new = df.join(
                indexed, df[id_col] == indexed["vec_id"], "left_anti"
            )
            if "dim" not in p:
                # infer from the EXISTING index, not from `new` — a
                # refresh with zero new rows must key an empty frame
                # (lsh_keyed_index can't infer dim from emptiness)
                probe = keyed.select(F.size("vec").alias("d")).first()
                if probe is not None and probe["d"] and probe["d"] > 0:
                    p["dim"] = int(probe["d"])
            keyed_new = D.lsh_keyed_index(
                new, id_col=id_col, vec_col=vec_col, **p
            )
            if rec["tables"]:
                t = rec["tables"][0]
                # persist the delta (count + write would otherwise
                # each run the anti-join + keying end to end).
                # Counts report VECTORS (distinct vec_id), not bucket
                # rows — keyed is one row per (vector × hash table),
                # and the ivf branch reports true vector counts; the
                # two methods must mean the same thing by new_rows.
                keyed_new = caching.track_persist(keyed_new)
                n_new = keyed_new.select("vec_id").distinct().count()
                if n_new:
                    save_bucketed_table(
                        keyed_new, t, ["tbl", "bkey"],
                        sort_col=["tbl", "bkey"], mode="append",
                    )
                # append-time operator persists die with the statement
                # scope; the table serves
                rec["frames"] = {"keyed": self.spark.table(t)}
            else:
                # vector counts, not bucket rows (see above)
                n_old = keyed.select("vec_id").distinct().count()
                # counted BEFORE the old generation's checkpoint
                # blocks are released by the union swap
                union = self._checkpoint_refresh_union(
                    rec, keyed.unionByName(keyed_new)
                )
                n_new = union.select("vec_id").distinct().count() - n_old
                caching.release_all(rec["owned"])
                rec["owned"] = caching.adopt_since(mark)
                rec["frames"] = {"keyed": union}
            total = (
                rec["frames"]["keyed"].select("vec_id").distinct().count()
            )
        return self.spark.createDataFrame(
            [(stmt.name, rec["method"], int(n_new), int(total))],
            "index_name string, method string, new_rows long,"
            " indexed_rows long",
        )

    def _checkpoint_refresh_union(self, rec: dict, union: DataFrame):
        """Materialize a refreshed in-memory index frame with its
        LINEAGE TRUNCATED (eager localCheckpoint), not merely cached:
        the union's recompute path re-reads the index's source, which
        has GROWN since the snapshot — a cache eviction would silently
        re-index every new row twice (old branch now includes them +
        the appended delta). Checkpoint blocks don't survive executor
        loss; an in-memory index never did — rebuild on loss, as
        documented. Prior refreshes' checkpoints are released once the
        new generation is materialized."""
        from declarativeml_spark.operators.caching import (
            release_checkpoint,
        )

        union = union.localCheckpoint(eager=True)
        for old in rec.get("checkpointed", ()):
            release_checkpoint(old)
        rec["checkpointed"] = [union]
        return union

    def _build_index_frames(
        self, stmt: "ir.CreateIndex", df, p, id_col, vec_col, mark
    ):
        """Build (and, for ``STORED AS``, persist to bucketed tables)
        the index's serving frames. Options are pre-validated by
        ``_create_index``; any failure here is cleaned up there."""
        from declarativeml_spark.operators import caching
        from declarativeml_spark.operators import dedup as D

        if stmt.method == "ivf":
            corpus, cents = D.native_cells(
                df,
                id_col,
                vec_col,
                n_cells=int(p.get("n_cells", 8)),
                n_iters=int(p.get("n_iters", 2)),
                dim=int(p.get("dim", 64)),
            )
            n_rows = corpus.count()  # materialize the snapshot NOW
            frames = {"corpus": corpus, "cents": cents}
        else:  # lsh (options validated by _create_index)
            # persist_base=False: this caller persists (or stores) the
            # exploded keyed frame itself — the operator's internal
            # vector-plane cache would be a second copy of every
            # vector (r11 advice #2)
            keyed = caching.track_persist(
                D.lsh_keyed_index(
                    df, id_col=id_col, vec_col=vec_col,
                    persist_base=False, **p,
                )
            )
            # materializes the persisted snapshot AND reports VECTORS
            # (keyed is one row per vector × hash table; indexed_rows
            # must mean the same thing for lsh and ivf)
            n_rows = keyed.select("vec_id").distinct().count()
            frames = {"keyed": keyed}
        owned = caching.adopt_since(mark)
        try:
            tables, frames, owned = self._store_index_tables(
                stmt, frames, owned
            )
        except BaseException:
            # adopted frames are outside the statement scope now — a
            # failed write must release them here (the caller's cleanup
            # only sees frames still in the scope)
            caching.release_all(owned)
            raise
        return frames, tables, n_rows, owned

    def _store_index_tables(self, stmt: "ir.CreateIndex", frames, owned):
        from declarativeml_spark.operators import caching

        tables: list[str] = []
        if stmt.stored_as is not None:
            # durable variant: write BUCKETED managed tables and serve
            # from them — the lsh bucket table is bucketed by bkey, so
            # the candidate self-join is co-located (HashPartitioning
            # on a subset of the join keys satisfies the clustering
            # requirement: no exchange); survives executor loss, which
            # in-memory checkpoint blocks do not
            from declarativeml_spark.operators.caching import (
                release_checkpoint,
            )
            from declarativeml_spark.sources.io import save_bucketed_table

            t = stmt.stored_as
            if stmt.method == "ivf":
                save_bucketed_table(frames["corpus"], t, "cell")
                frames["cents"].write.mode("overwrite").saveAsTable(
                    f"{t}_centroids"
                )
                release_checkpoint(frames["cents"])
                tables = [t, f"{t}_centroids"]
                frames = {
                    "corpus": self.spark.table(t),
                    "cents": self.spark.table(f"{t}_centroids"),
                }
            else:
                # both candidate-join keys — Spark's co-partition check
                # rejects a bucket-key subset of the join keys
                save_bucketed_table(
                    frames["keyed"], t, ["tbl", "bkey"],
                    sort_col=["tbl", "bkey"],
                )
                tables = [t]
                frames = {"keyed": self.spark.table(t)}
            for tbl in tables:
                self._mark_index_storage(tbl)
            caching.release_all(owned)  # the tables serve now
            owned = []
        return tables, frames, owned

    def _release_index(self, rec: dict) -> None:
        from declarativeml_spark.operators.caching import (
            release_all,
            release_checkpoint,
        )

        release_all(rec["owned"])
        if not rec.get("tables"):
            cents = rec["frames"].get("cents")
            if cents is not None:
                release_checkpoint(cents)
        for f in rec.get("checkpointed", ()):  # refresh generations
            release_checkpoint(f)
        for t in rec.get("tables", ()):
            try:
                self.spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:  # noqa: BLE001 — best-effort cleanup
                pass
            # the name is free again — a table the USER creates under
            # it later must not be silently cleanable on rebuild
            self._created_storage.discard(t)

    def _drop_index(self, stmt: "ir.DropIndex") -> dict:
        rec = self.indexes.pop(stmt.name, None)
        if rec is None:
            # a STORED AS index from another session is droppable too:
            # adopt it first so its tables and registry row go with it
            try:
                rec = self._adopt_stored_index(stmt.name)
            except ForeignRegistryTableError:
                raise  # a user table blocks the registry: say so
            except ValueError:
                # registered but storage partially gone: DROP reclaims
                # what survives (shape-guarded — a user table merely
                # reusing a freed name is never dropped) plus the
                # stale registry row, so the names are reusable
                self._reclaim_registry_row(stmt.name)
                return {"dropped": stmt.name}
            self.indexes.pop(stmt.name, None)
        if rec is None:
            raise ValueError(f"Unknown index {stmt.name!r}")
        self._release_index(rec)
        # clear any registry row unconditionally: a session-only index
        # can shadow a prior session's STORED row of the same name, and
        # DROP must not let that row resurrect the stale snapshot
        self._remove_index_registry(stmt.name)
        return {"dropped": stmt.name}

    # -- cross-session index registry (cold-start serving) -------------------
    # CREATE INDEX … STORED AS persists the serving frames as bucketed
    # tables, but the name→{method, params, tables} mapping lived only
    # on the engine — a driver restart could read the tables yet not
    # SERVE them. This one-row-per-index managed table closes that gap:
    # a fresh Engine adopts a stored index on first SEARCH/REFRESH/DROP
    # … USING INDEX <name>, probe-only, no rebuild.
    INDEX_REGISTRY_TABLE = "declml_index_registry"
    _INDEX_REGISTRY_SCHEMA = (
        "index_name string, method string, source string,"
        " source_is_identifier boolean, params string,"
        " tables array<string>"
    )

    # full dtype map, not just names: a user table with the same six
    # column NAMES but different types must not pass as the registry
    _INDEX_REGISTRY_DTYPES = {
        "index_name": "string",
        "method": "string",
        "source": "string",
        "source_is_identifier": "boolean",
        "params": "string",
        "tables": "array<string>",
    }

    def _read_index_registry(self) -> Optional[list]:
        """All registry rows, or None when no registry table exists.
        A same-named table with a FOREIGN shape is never read as (or
        overwritten by) the registry — same never-clobber-user-data
        discipline as the STORED AS target checks."""
        self._recover_index_registry_swap()
        if not self.spark.catalog.tableExists(self.INDEX_REGISTRY_TABLE):
            return None
        # the relation cache is PER SESSION: another live session's
        # registry rewrite (swap-rename or overwrite) replaces the
        # part files, and this session's cached listing would fail
        # FAILED_READ_FILE on the next read. The registry is a
        # handful of rows — refresh unconditionally before reading.
        self.spark.sql(f"REFRESH TABLE {self.INDEX_REGISTRY_TABLE}")
        reg = self.spark.table(self.INDEX_REGISTRY_TABLE)
        if dict(reg.dtypes) != self._INDEX_REGISTRY_DTYPES:
            raise ForeignRegistryTableError(
                f"Table {self.INDEX_REGISTRY_TABLE!r} exists but is not"
                " the engine's index registry (schema"
                f" {sorted(reg.dtypes)}) — rename or drop it"
            )
        return [r.asDict() for r in reg.collect()]

    def _registry_rows_without(self, name: str) -> list:
        return [
            r
            for r in (self._read_index_registry() or [])
            if r["index_name"] != name
        ]

    def _recover_index_registry_swap(self) -> None:
        """Crash recovery for the swap-rename window in
        :meth:`_write_index_registry`: a failure between ``DROP TABLE
        <registry>`` and ``ALTER TABLE <swap> RENAME`` leaves no
        registry but a COMPLETE ``__swap`` table. Without recovery the
        next write's ``_clean_tmp`` would delete that swap — silently
        losing every stored-index row even though the data survived
        the crash. Adopt a well-formed orphan by finishing the rename;
        a foreign-shaped same-named table is left alone (the usual
        never-clobber discipline — the write path's cleanup owns it)."""
        t = self.INDEX_REGISTRY_TABLE
        tmp = f"{t}__swap"
        if self.spark.catalog.tableExists(t) or not self.spark.catalog.tableExists(tmp):
            return
        self.spark.sql(f"REFRESH TABLE {tmp}")
        if dict(self.spark.table(tmp).dtypes) != self._INDEX_REGISTRY_DTYPES:
            return
        self.spark.sql(f"ALTER TABLE {tmp} RENAME TO {t}")
        self.spark.sql(f"REFRESH TABLE {t}")

    def _write_index_registry(self, rows: list) -> None:
        # callers have already read (and so shape-validated) the
        # registry; only the existence check remains
        import os
        import shutil

        self._recover_index_registry_swap()
        t = self.INDEX_REGISTRY_TABLE
        frame = self.spark.createDataFrame(
            rows, schema=self._INDEX_REGISTRY_SCHEMA
        )
        if not self.spark.catalog.tableExists(t):
            # an orphaned warehouse location (a previous catalog's
            # registry — e.g. a fresh in-memory metastore over a
            # shared warehouse dir) is stale by construction: nothing
            # it points to is registered in THIS catalog. Clean it the
            # way _create_index cleans orphaned index locations.
            loc = os.path.join(self._warehouse_path(), t)
            if os.path.isdir(loc):
                shutil.rmtree(loc, ignore_errors=True)
            frame.write.saveAsTable(t)
            return
        # swap-write (the _write_tokenizer_table pattern): a plain
        # overwrite drops the table before rewriting, so a mid-write
        # failure would lose EVERY stored index's row and leave their
        # bucketed tables orphaned with no DSL path to reclaim them.
        # The swap name is engine-internal by construction, so a
        # leftover from an interrupted swap is always safe to clean.
        tmp = f"{t}__swap"

        def _clean_tmp() -> None:
            try:
                self.spark.sql(f"DROP TABLE IF EXISTS {tmp}")
            except Exception:  # noqa: BLE001 — best-effort cleanup
                pass
            shutil.rmtree(
                os.path.join(self._warehouse_path(), tmp.lower()),
                ignore_errors=True,
            )

        try:
            _clean_tmp()  # leftover from an interrupted prior swap
            frame.write.saveAsTable(tmp)
        except BaseException:
            _clean_tmp()
            raise  # the existing good registry is untouched
        self.spark.sql(f"DROP TABLE IF EXISTS {t}")
        self.spark.sql(f"ALTER TABLE {tmp} RENAME TO {t}")
        # the rename leaves stale cached file listings for the name in
        # OTHER live sessions sharing this catalog (their next read
        # fails FAILED_READ_FILE on the swapped-out part files);
        # refresh invalidates the shared relation cache
        self.spark.sql(f"REFRESH TABLE {t}")

    # Explicit ownership marker on every stored-index table: the
    # column-subset shape guard alone cannot tell index storage from a
    # USER table that happens to have the same column names
    # (compatible-but-foreign shape, the round-7 verdict's adversarial
    # case). A table property is an unambiguous claim only the engine
    # writes, so reclaim/adoption require BOTH the shape and the mark.
    _INDEX_STORAGE_PROP = "declml.index_storage"

    def _mark_index_storage(self, table: str) -> None:
        self.spark.sql(
            f"ALTER TABLE {table} SET TBLPROPERTIES"
            f" ('{self._INDEX_STORAGE_PROP}'='1')"
        )

    def mark_legacy_index_storage(self, name: str) -> list:
        """One-time migration for stored indexes persisted BEFORE the
        ownership mark existed: stamp the registry row's storage
        tables so adoption/reclaim accept them again.

        Deliberately an EXPLICIT operator action, never automatic —
        auto-marking anything a registry row points at would reopen
        the squatting hole the mark closes (a user table reusing a
        recorded name would get claimed). The caller asserts "these
        tables really are index storage"; the shape subset is still
        required. Returns the tables marked.
        """
        rows = [
            r
            for r in (self._read_index_registry() or [])
            if r["index_name"] == name
        ]
        if not rows:
            raise ValueError(f"Unknown index {name!r}: no registry row")
        row = rows[0]
        marked = []
        for t, required in self._index_table_shapes(
            row["method"], list(row["tables"])
        ).items():
            if not self.spark.catalog.tableExists(t):
                # a silent skip here would report a no-op migration as
                # success; mirror _adopt_stored_index's missing-storage
                # error instead
                raise ValueError(
                    f"Cannot mark index {name!r}: its storage table"
                    f" {t!r} is gone (dropped out of band?) — CREATE"
                    " INDEX to rebuild instead"
                )
            if not required <= set(self.spark.table(t).columns):
                raise ValueError(
                    f"Refusing to mark {t!r}: it does not have index"
                    f" {name!r}'s storage columns {sorted(required)}"
                )
            self._mark_index_storage(t)
            marked.append(t)
        return marked

    def _has_table_prop(self, table: str, prop: str) -> bool:
        from pyspark.errors import AnalysisException

        try:
            rows = self.spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        except AnalysisException:  # no such table / view: not ours
            return False
        # anything else (transient catalog/metastore failure) must
        # propagate: swallowing it here would make a flaky metastore
        # indistinguishable from "not marked", steering
        # _adopt_stored_index into its destructive rebuild error and
        # the create-path reclaim into silently skipping a table the
        # engine actually owns.
        return any(r.key == prop and r.value == "1" for r in rows)

    def _is_index_storage(self, table: str) -> bool:
        return self._has_table_prop(table, self._INDEX_STORAGE_PROP)

    @staticmethod
    def _index_table_shapes(method: str, tables: list) -> dict:
        """Map each of an index's storage tables to the column subset
        that marks it as index storage (the reclaim guard: a table
        whose live shape lacks these is presumed USER data that merely
        reuses the name, and is never dropped)."""
        shapes: dict = {}
        if not tables:
            return shapes
        if method == "ivf":
            shapes[tables[0]] = {"cell"}  # bucketed corpus
            if len(tables) > 1:
                shapes[tables[1]] = {"cell"}  # centroid table
        else:  # lsh keyed bucket table
            shapes[tables[0]] = {"tbl", "bkey"}
        return shapes

    def _reclaim_storage(self, shapes: dict) -> list:
        """DROP tables + their warehouse dirs and release session
        ownership. ``shapes`` maps table → required column subset; a
        LIVE table missing those columns is skipped (never clobber
        presumed user data — an empty set always reclaims, for tables
        this statement itself just wrote). Returns the skipped names."""
        import os
        import shutil

        skipped = []
        wh = self._warehouse_path()
        for t, required in shapes.items():
            if self.spark.catalog.tableExists(t):
                # both guards, not either: the required-column subset
                # AND the engine's ownership property. A user table
                # with coincidentally compatible columns is missing
                # the mark; an empty `required` means the statement
                # itself just wrote the name (reclaim unconditionally).
                if required and (
                    not required <= set(self.spark.table(t).columns)
                    or not self._is_index_storage(t)
                ):
                    skipped.append(t)
                    continue
                try:
                    self.spark.sql(f"DROP TABLE IF EXISTS {t}")
                except Exception:  # noqa: BLE001 — best-effort cleanup
                    pass
            shutil.rmtree(os.path.join(wh, t.lower()), ignore_errors=True)
            self._created_storage.discard(t)
        return skipped

    def _reclaim_registry_row(
        self, name: str, keep: frozenset = frozenset()
    ) -> None:
        """Reclaim a registered index's surviving storage (shape
        -guarded) and its registry row. Tables named in ``keep``
        (lower-cased) are left standing — the caller's live lineage
        depends on them. No-op when no registry — or a foreign-shaped
        table under the registry name — exists."""
        try:
            rows = self._read_index_registry() or []
        except ForeignRegistryTableError:
            return  # not a registry: nothing registered to reclaim
        mine = [r for r in rows if r["index_name"] == name]
        for row in mine:
            shapes = self._index_table_shapes(
                row["method"], list(row["tables"])
            )
            shapes = {
                t: s for t, s in shapes.items() if t.lower() not in keep
            }
            self._reclaim_storage(shapes)
        if mine:
            self._write_index_registry(
                [r for r in rows if r["index_name"] != name]
            )

    def _upsert_index_registry(
        self, name: str, stmt: "ir.CreateIndex", tables: list
    ) -> None:
        import json as _json

        rows = self._registry_rows_without(name)
        rows.append(
            {
                "index_name": name,
                "method": stmt.method,
                "source": stmt.source,
                "source_is_identifier": stmt.source_is_identifier,
                "params": _json.dumps(dict(stmt.params), sort_keys=True),
                "tables": list(tables),
            }
        )
        self._write_index_registry(rows)

    def _remove_index_registry(self, name: str) -> None:
        """Drop a row (only). Session-only operations route here, so a
        foreign-shaped table under the registry name means 'no
        registry' — swallow it rather than failing an operation that
        needs no registry at all; only stored-index paths (which must
        WRITE) surface the foreign-table error."""
        try:
            rows = self._read_index_registry()
        except ForeignRegistryTableError:
            return
        if rows is None:
            return
        kept = [r for r in rows if r["index_name"] != name]
        if len(kept) != len(rows):  # rewrite only when a row existed
            self._write_index_registry(kept)

    def _adopt_stored_index(self, name: str) -> Optional[dict]:
        """Reconstruct a STORED AS index record from the registry and
        its bucketed tables (any session's). Returns None when the
        registry has no row for ``name``; raises when the row exists
        but its storage is gone (a failed rebuild or out-of-band drop
        — CREATE INDEX rebuilds it)."""
        import json as _json

        rows = [
            r
            for r in (self._read_index_registry() or [])
            if r["index_name"] == name
        ]
        if not rows:
            return None
        row = rows[0]
        tables = list(row["tables"])
        missing = [
            t for t in tables if not self.spark.catalog.tableExists(t)
        ]
        if missing:
            raise ValueError(
                f"Index {name!r} is registered but its storage table(s)"
                f" {', '.join(missing)} are gone (failed rebuild or"
                " dropped out of band) — CREATE INDEX to rebuild"
            )
        # shape-validate BEFORE serving (and before DROP could release
        # these frames): a user table that merely reuses a recorded
        # name must neither serve garbage nor ever be dropped
        for t, required in self._index_table_shapes(
            row["method"], tables
        ).items():
            have = set(self.spark.table(t).columns)
            marked = self._is_index_storage(t)
            if not required <= have or not marked:
                raise ValueError(
                    f"Index {name!r} is registered but table {t!r} does"
                    " not look like its index storage (columns"
                    f" {sorted(have)}, ownership mark {marked}) — the"
                    " name was likely reused; CREATE INDEX to rebuild"
                    " (or, for storage written before the ownership"
                    " mark existed, run"
                    f" Engine.mark_legacy_index_storage({name!r}) once)"
                )
        if row["method"] == "ivf":
            frames = {
                "corpus": self.spark.table(tables[0]),
                "cents": self.spark.table(tables[1]),
            }
        else:
            frames = {"keyed": self.spark.table(tables[0])}
        rec = {
            "method": row["method"],
            "source": row["source"],
            "source_is_identifier": bool(row["source_is_identifier"]),
            "params": _json.loads(row["params"]),
            "frames": frames,
            "owned": [],  # serves straight from the tables: no caches
            "tables": tables,
        }
        self.indexes[name] = rec
        return rec

    # -- TRAIN TOKENIZER (beyond-parity, SURVEY §2.11) -----------------------
    def _warehouse_path(self) -> str:
        from declarativeml_spark.sources.io import warehouse_path

        return warehouse_path(self.spark)

    def _train_tokenizer(self, stmt: "ir.TrainTokenizer") -> DataFrame:
        """BPE-merge training (operators/bpe.py): ``VOCAB n`` is the
        target vocabulary size, so the engine learns
        ``n − |base alphabet|`` merges (the alphabet is counted on
        BPE's own vocabulary-sized word-type frame — the corpus scans
        exactly once). The learned merge table is kept on the engine
        (``tokenizers[name]``, a handful of rows) for reuse;
        ``STORED AS <t>`` additionally persists it as a managed table
        (same ownership discipline as CREATE INDEX: a pre-existing
        table this session didn't write is never silently
        overwritten), so ``TOKENIZE … USING <t>`` works in a FRESH
        session — unlike the session dict, the table survives."""
        import os

        from declarativeml_spark.operators.bpe import bpe_merges

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        if stmt.text_column not in df.columns:
            raise ValueError(
                f"TRAIN TOKENIZER: source has no column"
                f" {stmt.text_column!r}"
            )
        # storage-target validation BEFORE the (expensive) learn, and
        # before anything about the existing same-name tokenizer is
        # touched — a failing statement leaves the working one intact
        if stmt.stored_as is not None:
            t = stmt.stored_as
            if t == self.INDEX_REGISTRY_TABLE:
                raise ValueError(
                    f"STORED AS target {t!r} is the engine's index"
                    " registry table — pick another name"
                )
            index_owned = {
                tbl: nm
                for nm, rec in self.indexes.items()
                for tbl in rec.get("tables", ())
            }
            if t in index_owned:
                raise ValueError(
                    f"STORED AS target {t!r} belongs to live index"
                    f" {index_owned[t]!r} — pick another name"
                )
            other = {
                tbl: nm
                for nm, tbl in self.tokenizer_tables.items()
                if nm != stmt.name
            }
            if t in other:
                raise ValueError(
                    f"STORED AS target {t!r} belongs to tokenizer"
                    f" {other[t]!r} — pick another name or drop it first"
                )
            owned = (
                t == self.tokenizer_tables.get(stmt.name)
                or t in self._created_storage
            )
            if not owned:
                if self.spark.catalog.tableExists(t):
                    raise ValueError(
                        f"STORED AS target {t!r} already exists and does"
                        f" not belong to tokenizer {stmt.name!r} — pick"
                        " another name or drop the table first"
                    )
                loc = os.path.join(self._warehouse_path(), t.lower())
                if os.path.isdir(loc):
                    raise ValueError(
                        f"STORED AS target location {loc!r} already"
                        " exists (orphaned by a previous session?) —"
                        " remove it or pick another name"
                    )
        merges = bpe_merges(df, stmt.text_column, vocab=stmt.vocab)
        # Target resolution: an explicit STORED AS wins; a retrain of a
        # tokenizer that already HAS a durable table keeps that table
        # in sync (otherwise the stored form would silently serve the
        # OLD merges to fresh sessions while this session uses the new
        # ones — the name owns the table, so retraining refreshes it).
        t = stmt.stored_as or self.tokenizer_tables.get(stmt.name)
        if t is not None:
            self._write_tokenizer_table(merges, t)
            old_table = self.tokenizer_tables.get(stmt.name)
            if old_table and old_table != t:
                # retrained under a new table: release the old one
                try:
                    self.spark.sql(f"DROP TABLE IF EXISTS {old_table}")
                except Exception:  # noqa: BLE001 — best-effort cleanup
                    pass
                self._created_storage.discard(old_table)
            self.tokenizer_tables[stmt.name] = t
            merges = self.spark.table(t)  # serve from the durable form
        self.tokenizers[stmt.name] = merges
        return merges

    _TOKENIZER_SHAPE = frozenset({"merge_round", "lhs", "rhs"})

    def _recover_tokenizer_swap(self, t: str) -> None:
        """Crash recovery for the swap-rename window in
        :meth:`_write_tokenizer_table` (the
        ``_recover_index_registry_swap`` analog): a failure between
        ``DROP TABLE <t>`` and ``ALTER TABLE <t>__swap RENAME`` leaves
        no table but a COMPLETE swap. Without recovery the new merges
        are stranded AND the orphan swap trips the next retrain's
        ownership guard ('remove it or pick another STORED AS name') —
        the engine's own crash permanently blocking the retrain. Adopt
        a merge-shaped orphan by finishing the rename; anything else
        is left alone (the usual never-clobber discipline)."""
        tmp = f"{t}__swap"
        if self.spark.catalog.tableExists(t) or not self.spark.catalog.tableExists(
            tmp
        ):
            return
        self.spark.sql(f"REFRESH TABLE {tmp}")
        if not self._TOKENIZER_SHAPE <= set(self.spark.table(tmp).columns):
            return
        self.spark.sql(f"ALTER TABLE {tmp} RENAME TO {t}")
        self.spark.sql(f"REFRESH TABLE {t}")

    def _write_tokenizer_table(self, merges: DataFrame, t: str) -> None:
        """Persist a merge table ATOMICALLY with respect to an existing
        good copy: a retrain writes to a swap table first and only then
        drops + renames, so a failed write leaves the previous durable
        table (and the session state pointing at it) fully intact — a
        plain ``mode("overwrite")`` would destroy it on a mid-write
        failure. Fresh targets write directly."""
        import os
        import shutil

        self._recover_tokenizer_swap(t)

        def _clean(name: str) -> None:
            try:
                self.spark.sql(f"DROP TABLE IF EXISTS {name}")
            except Exception:  # noqa: BLE001 — best-effort cleanup
                pass
            shutil.rmtree(
                os.path.join(self._warehouse_path(), name.lower()),
                ignore_errors=True,
            )

        if self.spark.catalog.tableExists(t):
            tmp = f"{t}__swap"
            if (
                self.spark.catalog.tableExists(tmp)
                and tmp not in self._created_storage
            ):
                # a crash between the swap save and the DROP of the old
                # table leaves BOTH standing: the good table t plus an
                # engine-written merge-shaped swap. That leftover is
                # safe to clean (and _clean below does); only a
                # foreign-shaped squatter on the swap name is refused.
                self.spark.sql(f"REFRESH TABLE {tmp}")
                if not self._TOKENIZER_SHAPE <= set(
                    self.spark.table(tmp).columns
                ):
                    raise ValueError(
                        f"swap table {tmp!r} exists and is not"
                        " session-owned — remove it or pick another"
                        " STORED AS name"
                    )
            try:
                self._created_storage.add(tmp)
                _clean(tmp)  # leftover from an interrupted prior swap
                merges.write.saveAsTable(tmp)
            except BaseException:
                _clean(tmp)
                self._created_storage.discard(tmp)
                raise  # the existing good table is untouched
            self.spark.sql(f"DROP TABLE IF EXISTS {t}")
            self.spark.sql(f"ALTER TABLE {tmp} RENAME TO {t}")
            # invalidate other sessions' cached file listings for the
            # name (same reason as the registry swap-write refresh)
            self.spark.sql(f"REFRESH TABLE {t}")
            self._created_storage.discard(tmp)
        else:
            try:
                merges.write.saveAsTable(t)
            except BaseException:
                # no prior table to protect: unmark and clean partials
                _clean(t)
                self._created_storage.discard(t)
                raise
        self._created_storage.add(t)

    # -- TOKENIZE (apply side, beyond-parity, SURVEY §2.11) ------------------
    def _tokenize(self, stmt: "ir.Tokenize") -> DataFrame:
        """Encode a corpus with a trained tokenizer: all learned merge
        rules compose into ONE map-side fold chain added as a projected
        ``tokens`` column (operators/bpe.py::bpe_tokens_expr) — no
        shuffle, no UDF, no per-rule corpus pass. The tokenizer
        resolves to a session-trained name first, then to a STORED AS
        merge table in the catalog (the fresh-session path)."""
        from declarativeml_spark.operators.bpe import bpe_tokens_expr

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        if stmt.text_column not in df.columns:
            raise ValueError(
                f"TOKENIZE: source has no column {stmt.text_column!r}"
            )
        merges = self.tokenizers.get(stmt.tokenizer)
        if merges is not None:
            t = self.tokenizer_tables.get(stmt.tokenizer)
            if t is not None and self.spark.catalog.tableExists(t):
                # the session frame serves from the durable table;
                # another live session's rewrite replaces its part
                # files and the bound frame's resolved file listing
                # goes stale (the relation cache is per session — same
                # reason _read_index_registry refreshes
                # unconditionally). REFRESH alone is not enough: the
                # already-analyzed DataFrame keeps its frozen file
                # index, so re-bind from the catalog too.
                self.spark.sql(f"REFRESH TABLE {t}")
                merges = self.spark.table(t)
                self.tokenizers[stmt.tokenizer] = merges
        if merges is None:
            # a prior session's crash may have stranded the merges in
            # the swap (see _recover_tokenizer_swap)
            self._recover_tokenizer_swap(stmt.tokenizer)
            if not self.spark.catalog.tableExists(stmt.tokenizer):
                raise ValueError(
                    f"Unknown tokenizer {stmt.tokenizer!r}; train one with"
                    " TRAIN TOKENIZER, or reference a STORED AS merge"
                    " table by its table name"
                )
            self.spark.sql(f"REFRESH TABLE {stmt.tokenizer}")
            merges = self.spark.table(stmt.tokenizer)
            missing = {"merge_round", "lhs", "rhs"} - set(merges.columns)
            if missing:
                raise ValueError(
                    f"Table {stmt.tokenizer!r} is not a tokenizer merge"
                    f" table (missing column(s) {', '.join(sorted(missing))})"
                )
        # rule order matters: BPE applies merges in learning order
        rules = [
            (r.lhs, r.rhs)
            for r in merges.select("merge_round", "lhs", "rhs")
            .orderBy("merge_round")
            .collect()  # bounded: vocab − alphabet rows
        ]
        from declarativeml_spark.operators.bpe import (
            MAX_CODEGEN_RULES,
            bpe_tokenize_map,
        )

        if len(rules) <= MAX_CODEGEN_RULES:
            # small vocab: one composed codegen fold — pure JVM
            out = df.withColumn(
                "tokens", F.expr(bpe_tokens_expr(stmt.text_column, rules))
            )
        else:
            # large vocab: the nested expression exceeds Catalyst's
            # parser complexity limit — encode in an Arrow batch with
            # identical greedy semantics (operators/bpe.py, tested
            # equal); still map-only
            out = bpe_tokenize_map(df, stmt.text_column, rules)
        return out.withColumn("n_tokens", F.size("tokens").cast("long"))

    def _drop_tokenizer(self, stmt: "ir.DropTokenizer") -> dict:
        if (
            stmt.name not in self.tokenizers
            and stmt.name not in self.tokenizer_tables
        ):
            raise ValueError(f"Unknown tokenizer {stmt.name!r}")
        self.tokenizers.pop(stmt.name, None)
        t = self.tokenizer_tables.pop(stmt.name, None)
        if t:
            try:
                self.spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:  # noqa: BLE001 — best-effort cleanup
                pass
            self._created_storage.discard(t)
        return {"dropped": stmt.name}

    # -- DECODE / SAMPLE FRAMES / RESIZE (multimodal DSL twins) ------------
    @staticmethod
    def _ensure_builtin_codec(codec: str) -> None:
        """Auto-register the engine-shipped real parsers by name so a
        DSL user can say ``USING wav`` without an API call first;
        unknown names fall through to operators/multimodal.py's loud
        NotImplementedError (register_codec is the plug-in point)."""
        from declarativeml_spark.operators import multimodal as M

        if codec == "wav":
            M.register_wav_codec()
        elif codec == "ppm":
            M.register_ppm_codec()
        elif codec == "y4m":
            M.register_y4m_codec()

    def _load_media(self, stmt: "ir.LoadMedia") -> DataFrame:
        from declarativeml_spark.sources.io import read_media

        df = read_media(
            self.spark,
            stmt.path,
            glob=stmt.glob,
            recursive=stmt.recursive,
            partitioned=stmt.partitioned,
        )
        if stmt.view:
            df.createOrReplaceTempView(stmt.view)
        return df

    @staticmethod
    def _quoted_media_path(source: str) -> "Optional[str]":
        """A single-quoted source clause is a filesystem path/glob
        (``DECODE 'clips/*.wav' USING wav``), not a relation."""
        import re as _re

        m = _re.fullmatch(r"'((?:''|[^'])*)'", source.strip())
        return m.group(1).replace("''", "'") if m else None

    def _media_source(self, stmt) -> DataFrame:
        path = self._quoted_media_path(stmt.source)
        if path is not None:
            from declarativeml_spark.sources.io import read_media

            df = read_media(self.spark, path)
        else:
            df = resolve_source(
                self.spark, stmt.source, stmt.source_is_identifier
            )
        for label, col in (
            ("PAYLOAD COLUMN", stmt.payload_column),
            ("ID COLUMN", stmt.id_column),
        ):
            if col not in df.columns:
                raise ValueError(
                    f"{type(stmt).__name__}: source has no {label} {col!r}"
                )
        return df

    def _decode_media(self, stmt: "ir.DecodeMedia") -> DataFrame:
        from declarativeml_spark.operators.multimodal import (
            decode_features,
            window_energy,
        )

        self._ensure_builtin_codec(stmt.codec)
        df = self._media_source(stmt)
        if stmt.windows is not None:
            # windowed analysis over the codec's DECODED samples
            return window_energy(
                df,
                payload_col=stmt.payload_column,
                id_col=stmt.id_column,
                codec=stmt.codec,
                window_samples=stmt.windows,
            )
        return decode_features(
            df,
            payload_col=stmt.payload_column,
            id_col=stmt.id_column,
            codec=stmt.codec,
        )

    def _sample_frames(self, stmt: "ir.SampleFrames") -> DataFrame:
        from declarativeml_spark.operators.multimodal import sample_frames

        self._ensure_builtin_codec(stmt.codec)
        df = self._media_source(stmt)
        return sample_frames(
            df,
            payload_col=stmt.payload_column,
            id_col=stmt.id_column,
            every_n=stmt.every,
            codec=stmt.codec,
        )

    def _resize_media(self, stmt: "ir.ResizeMedia") -> DataFrame:
        from declarativeml_spark.operators.multimodal import resize_image

        self._ensure_builtin_codec(stmt.codec)
        df = self._media_source(stmt)
        return resize_image(
            df,
            payload_col=stmt.payload_column,
            width=stmt.width,
            height=stmt.height,
            codec=stmt.codec,
            id_col=stmt.id_column,
        )

    # -- DEDUPLICATE / SEARCH SIMILAR (beyond-parity, SURVEY §7.5) ----------
    def _deduplicate(self, stmt: ir.Deduplicate) -> DataFrame:
        from declarativeml_spark.operators import dedup as D

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        p = dict(stmt.params)
        # the column can arrive as ON <col> or column => "..."; pop the
        # param unconditionally (leaving it in p turns **p into a raw
        # TypeError) and give ON precedence
        col_param = p.pop("column", None)
        if stmt.column and col_param and stmt.column != col_param:
            raise ValueError(
                "DEDUPLICATE got two different columns: ON"
                f" {stmt.column!r} vs column => {col_param!r}"
            )
        chosen_col = stmt.column or col_param
        text_col = chosen_col or "text"
        id_param = p.pop("id_col", None)
        id_col = id_param or "doc_id"
        if stmt.method in ("exact", "simhash"):
            # these methods take no tuning surface — reject leftovers
            # loudly instead of silently ignoring them (every other
            # option surface here raises on unknown options, and a
            # user who wrote THRESHOLD believes a cutoff was applied)
            if p:
                raise ValueError(
                    f"DEDUPLICATE USING {stmt.method} does not accept"
                    f" option(s) {', '.join(sorted(p))}; accepted:"
                    " column, id_col"
                )
            if stmt.threshold is not None:
                raise ValueError(
                    f"DEDUPLICATE USING {stmt.method} does not accept"
                    " THRESHOLD (exact grouping / signature emission"
                    " has no similarity cutoff)"
                )
        if stmt.method == "exact":
            return D.exact_duplicates(df, id_col=id_col, text_col=text_col)
        if stmt.method == "simhash":
            return D.simhash_signatures(df, id_col=id_col, text_col=text_col)
        if stmt.method == "minhash":
            return D.minhash_pairs(
                df,
                id_col=id_col,
                text_col=text_col,
                threshold=stmt.threshold if stmt.threshold is not None else 0.5,
                **p,
            )
        if stmt.method == "ngram":
            return D.ngram_jaccard_pairs(
                df,
                id_col=id_col,
                text_col=text_col,
                threshold=stmt.threshold if stmt.threshold is not None else 0.15,
                **p,
            )
        if stmt.method == "containment":
            # asymmetric quote/subset detection (oracle-checked twin:
            # dedup_ngram_containment)
            return D.ngram_containment_pairs(
                df,
                id_col=id_col,
                text_col=text_col,
                threshold=stmt.threshold if stmt.threshold is not None else 0.5,
                **p,
            )
        if stmt.method == "semantic":
            # SemDeDup: deterministic k-means cells + within-cell
            # cosine domination over an embedding column
            return D.semdedup(
                df,
                id_col=id_param or "vec_id",
                vec_col=chosen_col or "embedding",
                threshold=stmt.threshold if stmt.threshold is not None else 0.35,
                **p,
            )
        if stmt.method == "clusters":
            # minhash pairs -> connected components (one canonical doc
            # per near-dup cluster; see operators/dedup.py)
            pairs = D.minhash_pairs(
                df,
                id_col=id_col,
                text_col=text_col,
                threshold=stmt.threshold if stmt.threshold is not None else 0.5,
                **p,
            ).select("id_a", "id_b")
            return D.connected_components(pairs)
        # embedding near-dup: ON names the vector column
        return D.embedding_pairs(
            df,
            id_col=id_param or "vec_id",
            vec_col=chosen_col or "embedding",
            threshold=stmt.threshold if stmt.threshold is not None else 0.35,
            **p,
        )

    # -- DECONTAMINATE / PACK (corpus prep; SURVEY §2.11) ------------------
    def _decontaminate(self, stmt: ir.Decontaminate) -> DataFrame:
        from declarativeml_spark.operators.corpus import benchmark_overlap

        corpus = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        bench = resolve_source(
            self.spark, stmt.benchmark, stmt.benchmark_is_identifier
        )
        return benchmark_overlap(
            corpus,
            bench,
            text_col=stmt.column or "text",
            min_overlap=stmt.threshold,
        )

    def _pack(self, stmt: ir.PackSequences) -> DataFrame:
        from declarativeml_spark.operators.corpus import pack_chunks

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        return pack_chunks(
            df,
            text_col=stmt.column or "text",
            context=stmt.context,
            buckets=stmt.buckets,
        )

    # -- REDACT / CHUNK (corpus prep; SURVEY §2.11) ------------------------
    def _redact(self, stmt: "ir.RedactPII") -> DataFrame:
        """Mask PII in the text column in place; append per-class
        match counts so the caller can audit what was scrubbed."""
        from declarativeml_spark.operators.pii import pii_counts, pii_redact

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        col = stmt.column or "text"
        counts = pii_counts(col)
        return df.select(
            *[c for c in df.columns if c != col],
            *counts,
            pii_redact(col).alias(col),
        )

    def _chunk(self, stmt: "ir.ChunkWindows") -> DataFrame:
        from declarativeml_spark.operators.corpus import chunk_windows

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        return chunk_windows(
            df,
            text_col=stmt.column or "text",
            win=stmt.win,
            stride=stmt.stride,
        )

    # -- SESSIONIZE / QUANTIZE (SURVEY §2.9 / §2.11) -----------------------
    def _sessionize(self, stmt: "ir.Sessionize") -> DataFrame:
        """Per-key session aggregation with native session_window —
        batch form of streaming/pipeline.py::session_window_stats
        (the oracle-checked twin is events_user_sessions)."""
        from declarativeml_spark.streaming.pipeline import session_window_stats

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        gap = f"{stmt.gap_value} {stmt.gap_unit.lower()}"
        return session_window_stats(
            df,
            ts_col=stmt.ts_column or "ts",
            key_col=stmt.key,
            value_col=stmt.value_column or "value",
            gap=gap,
            streaming=False,
        )

    def _quantize(self, stmt: "ir.QuantizeEmbeddings") -> DataFrame:
        """int8 scalar quantization of an embedding column (the
        oracle-checked twin is embedding_quantize_int8)."""
        from declarativeml_spark.operators.dedup import quantize_int8

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        return quantize_int8(
            df,
            id_col=stmt.id_column or "vec_id",
            vec_col=stmt.column or "embedding",
        )

    # -- SAMPLE (deterministic hash sampling; SURVEY §7.5 family) ----------
    def _sample(self, stmt: ir.SampleCorpus) -> DataFrame:
        """RATE form: keep ``rate`` of rows, chosen by a Lehmer hash of
        the id column — reproducible and restart-safe, unlike rand();
        see queries/pipeline.py::corpus_mix_sample for the
        overflow-safe arithmetic and its DuckDB-checked oracle form.

        TOP form: Efraimidis-Spirakis weighted sampling without
        replacement — the ``top_n`` smallest ``-ln(u)/w`` keys win,
        with u from the same Lehmer hash and w the weight column; see
        queries/pipeline2.py::corpus_weighted_sample for the
        oracle-checked form. Rows with non-positive weight are
        excluded (their inclusion probability is zero)."""
        from pyspark.sql import functions as F

        from declarativeml_spark.operators.layout import LEHMER_ID

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        col = stmt.column or "doc_id"
        # the SHARED Lehmer text (two wrap steps: one multiply maps a
        # small consecutive id range onto a small prefix of [0, m), the
        # second actually mixes). LEHMER_ID's BIGINT cast matters: an
        # INT-typed id column would overflow the *48271 in 32-bit
        # arithmetic (ANSI abort, silent wrap otherwise) and diverge
        # from every other Lehmer consumer
        h = F.expr(LEHMER_ID.format(id=col))
        if stmt.rate is not None:
            return df.filter(h < F.lit(float(stmt.rate) * 2147483647.0))
        w = F.col(stmt.weight_column).cast("double")
        skey = -F.log((h + 1.0) / 2147483648.0) / w
        return (
            df.filter(w > 0)
            .withColumn("__skey", skey)
            .orderBy(F.asc("__skey"), F.asc(col))
            .limit(stmt.top_n)
            .drop("__skey")
        )

    def _mix(self, stmt: "ir.MixCorpus") -> DataFrame:
        """Temperature-scaled mixing weights per group (the
        oracle-checked twin is corpus_temperature_mix)."""
        from declarativeml_spark.operators.corpus import temperature_mix

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        return temperature_mix(df, by_col=stmt.by)

    def _profile(self, stmt: "ir.ProfileTable") -> DataFrame:
        """Numeric column profiling (the oracle-checked twin is
        lineitem_numeric_profile)."""
        from declarativeml_spark.operators.profile import numeric_profile

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        return numeric_profile(df, stmt.columns)

    def _shard(self, stmt: "ir.ShardCorpus") -> DataFrame:
        """Balanced round-robin shard assignment (the oracle-checked
        audit twin is corpus_shard_assignment)."""
        from declarativeml_spark.operators.layout import shard_round_robin

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        return shard_round_robin(
            df, n_shards=stmt.n_shards, id_col=stmt.id_column
        )

    def _shuffle(self, stmt: "ir.ShuffleCorpus") -> DataFrame:
        """Deterministic per-epoch training-order shuffle (the
        oracle-checked balance-audit twin is corpus_epoch_shuffle)."""
        from declarativeml_spark.operators.layout import epoch_shuffle

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        return epoch_shuffle(
            df,
            epochs=stmt.epochs,
            n_shards=stmt.n_shards,
            id_col=stmt.id_column,
        )

    def _score_quality(self, stmt: "ir.ScoreQuality") -> DataFrame:
        """fastText-shaped linear quality margin per document (the
        oracle-checked rollup twin is quality_linear_margin)."""
        from declarativeml_spark.operators.textops import quality_margin

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        return quality_margin(
            df, buckets=stmt.buckets, text_col=stmt.text_column
        )

    def _weigh(self, stmt: "ir.WeighCorpus") -> DataFrame:
        """DSIR importance weights per document (the oracle-checked
        top-k twin is dsir_importance_weights)."""
        from declarativeml_spark.operators.corpus import dsir_weights

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        return dsir_weights(
            df,
            target_col=stmt.target_column,
            target_value=stmt.target_value,
            buckets=stmt.buckets,
        )

    def _audit_anonymity(self, stmt: "ir.AuditAnonymity") -> DataFrame:
        """k-anonymity equivalence-class report over quasi-identifier
        columns (the oracle-checked behavioural-profile twin is
        events_k_anonymity)."""
        from declarativeml_spark.operators.privacy import k_anonymity_report

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        return k_anonymity_report(df, stmt.columns, risk=stmt.risk)

    def _calibrate_dedup(self, stmt: "ir.CalibrateDedup") -> DataFrame:
        """Dedup threshold calibration curve from one pair
        materialization (the oracle-checked twin is
        dedup_threshold_sweep)."""
        from declarativeml_spark.operators.dedup import threshold_sweep

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        return threshold_sweep(
            df, stmt.thresholds, text_col=stmt.text_column
        )

    def _compact(self, stmt: "ir.CompactTable") -> DataFrame:
        """Next-fit compaction grouping over a file manifest (the
        oracle-checked twin is lakehouse_compaction_plan)."""
        from declarativeml_spark.operators.layout import compaction_groups

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        return compaction_groups(
            df,
            stmt.target_bytes,
            part_col=stmt.part_column,
            file_col=stmt.file_column,
            bytes_col=stmt.bytes_column,
        )

    def _detect_anomalies(self, stmt: "ir.DetectAnomalies") -> DataFrame:
        """Trailing-window rate anomalies (the oracle-checked twin is
        events_rate_anomalies; streaming_rate_anomalies the stream
        form)."""
        from declarativeml_spark.operators.anomaly import rate_anomalies

        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        # min_full scales with the window (half of it, floor 2) so a
        # short WINDOW can still flag — a fixed 12 would make any
        # WINDOW < 12 statement silently never-anomalous.
        return rate_anomalies(
            df,
            key_col=stmt.key,
            ts_col=stmt.ts_column or "ts",
            window_size=stmt.window,
            min_full=max(2, stmt.window // 2),
        )

    def _similarity_search(self, stmt: ir.SimilaritySearch) -> DataFrame:
        import inspect

        from declarativeml_spark.operators import dedup as D

        p = dict(stmt.params)
        if "k" in p:
            # a k => param would collide with TOP's keyword argument
            # as a raw 'multiple values for k' TypeError
            raise ValueError(
                "SEARCH SIMILAR takes its result size from the TOP"
                " clause, not a k => option"
            )
        k = stmt.k if stmt.k is not None else 10
        if stmt.method == "index":
            return self._search_from_index(stmt, p, k)
        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        if stmt.method == "lsh":
            fn, kw = D.lsh_topk_pairs, p
        elif stmt.method == "ivf":
            # The deterministic pinned-Lloyd's quantizer IS the DSL
            # path (hash-checked vs the DuckDB oracle, query
            # ann_ivf_topk); the MLlib k-means|| variant stays
            # reachable as 'ivf_mllib' for init-quality comparisons
            # (tests/test_dedup_dsl.py).
            fn, kw = D.ivf_native_topk, dict(k=k, **p)
        elif stmt.method == "ivf_mllib":
            fn, kw = D.ivf_topk, dict(k=k, **p)
        else:
            fn, kw = D.cosine_topk, dict(k=k, **p)
        # validate option names HERE so an unsupported option is the
        # DSL's typed error, not a raw TypeError from **kw — e.g.
        # seed/max_iter are k-means|| knobs that the deterministic
        # 'ivf' quantizer does not have (use ivf_mllib for those)
        # cache_key is an internal memo handle for immutable bench
        # inputs (operators/dedup.py::native_cells) — exposing it to
        # the DSL would let two statements alias different/changed
        # sources to one frozen quantizer
        accepted = set(inspect.signature(fn).parameters) - {"df", "cache_key"}
        unknown = sorted(set(kw) - accepted)
        if unknown:
            raise ValueError(
                f"SEARCH SIMILAR USING {stmt.method} does not accept "
                f"option(s) {', '.join(unknown)!s}; accepted: "
                f"{', '.join(sorted(accepted))}"
                + (
                    " (seed/max_iter are k-means|| options — use"
                    " USING ivf_mllib)"
                    if stmt.method == "ivf"
                    and {"seed", "max_iter"} & set(unknown)
                    else ""
                )
            )
        out = fn(df, **kw)
        if stmt.method == "lsh" and stmt.k is not None:
            # honor an explicit TOP for the pair join too: the k
            # closest pairs, deterministic tiebreak — silently
            # returning the full threshold set ignored the clause
            out = out.orderBy(
                F.col("euclidean_dist").asc(),
                F.col("id_a").asc(),
                F.col("id_b").asc(),
            ).limit(stmt.k)
        return out

    # -- REGISTER AGENT (catalog row + subscription, AGENTS.md:189-196) -------
    def _register_agent_catalog(self, stmt: ir.RegisterAgent) -> dict:
        from declarativeml_spark.ml.ensemble import _append_record

        record = {
            "name": stmt.name,
            "algorithm": "agent",
            "version": 1,
            "capabilities": stmt.capabilities,
            "subscribe_to": stmt.subscribe_to,
            "publish_to": stmt.publish_to,
            "priority": stmt.priority,
            "resource_limits": stmt.resource_limits,
            "status": "registered",
        }
        _append_record(self.model_dir, record)
        patterns = (
            stmt.subscribe_to
            if isinstance(stmt.subscribe_to, list)
            else [stmt.subscribe_to]
            if stmt.subscribe_to
            else []
        )
        for i, pat in enumerate(patterns):
            # matched events are recorded for the agent's queue; one
            # subscription NAME per pattern, or dispatch_batch's
            # per-subscription counts would overwrite each other
            self.bus.subscribe(
                pat, lambda df: None, name=f"agent:{stmt.name}:{i}"
            )
        return record

    # -- EXPLAIN PREDICTION ----------------------------------------------------
    def _explain(self, stmt: ir.ExplainPrediction) -> DataFrame:
        from declarativeml_spark.ml.evaluate import explain_predictions
        from declarativeml_spark.plans.builder import build_features

        meta = self._model_meta(stmt.model)
        if meta is None:
            raise ValueError(f"No registered model named {stmt.model!r}")
        if stmt.source is None:
            # the reference form names no source: explain rows selected
            # out of the model's own stored TRAIN source
            if not meta.get("statement"):
                raise ValueError(
                    f"Model {stmt.model!r} has no stored TRAIN statement"
                    " — name a source explicitly (EXPLAIN PREDICTION FOR"
                    " MODEL … FROM <source>)"
                )
            train_stmt = parse(meta["statement"])
            df = resolve_source(
                self.spark, train_stmt.source, train_stmt.source_is_identifier
            )
        else:
            df = resolve_source(
                self.spark, stmt.source, stmt.source_is_identifier
            )
        background = None
        if stmt.row_filter is not None:
            col, value = stmt.row_filter
            if col not in df.columns:
                raise ValueError(
                    f"EXPLAIN selector column {col!r} is not in the"
                    f" source (columns: {', '.join(df.columns)})"
                )
            # the UNFILTERED source is the SHAP background: the
            # filtered single row's own mean is the row itself, so
            # every linear contribution collapsed to coef*(x-x)=0 —
            # a vacuous all-zero explanation
            background = build_features(df, meta["features"]).df
            df = df.filter(F.col(col) == F.lit(value))
        df = build_features(df, meta["features"]).df
        return explain_predictions(
            self.spark,
            stmt.model,
            df,
            feature_names=meta["features"],
            top_k=stmt.top_k,
            base=self.model_dir,
            background_df=background,
        )

    # -- CREATE TYPE (reference DSL.md:177-210) -------------------------------
    _PG_TO_SPARK = {
        "TEXT": "string",
        "VARCHAR": "string",
        "CHAR": "string",
        "JSONB": "string",  # JSON text; Spark's JSON fns take strings
        "JSON": "string",
        "INTEGER": "int",
        "INT": "int",
        "SMALLINT": "short",
        "BIGINT": "long",
        "FLOAT": "double",
        "REAL": "float",
        "DOUBLE": "double",
        "NUMERIC": "decimal(38,12)",
        "BOOLEAN": "boolean",
        "TIMESTAMP": "timestamp",
        "DATE": "date",
    }

    def _create_type(self, stmt: "ir.CreateType") -> DataFrame:
        """Register a named composite: PG types resolve to a Spark
        StructType kept on the engine (``types[name]``); the result
        DataFrame describes the mapping (one row per field)."""
        from pyspark.sql import types as T

        rows = []
        struct_fields = []
        for fname, ftype in stmt.fields:
            base = ftype
            is_array = base.endswith("[]")
            if is_array:
                base = base[:-2]
            base = base.split("(")[0]  # VARCHAR(100) → VARCHAR
            spark_type = self._PG_TO_SPARK.get(base)
            if spark_type is None:
                raise ValueError(
                    f"Unsupported type {ftype!r} for field {fname!r};"
                    f" supported: {', '.join(sorted(self._PG_TO_SPARK))}"
                    " (plus [] array suffixes)"
                )
            if is_array:
                spark_type = f"array<{spark_type}>"
            struct_fields.append(
                T.StructField(
                    fname, T._parse_datatype_string(spark_type), True
                )
            )
            rows.append((stmt.name, fname, ftype, spark_type))
        self.types[stmt.name] = T.StructType(struct_fields)
        return self.spark.createDataFrame(
            rows,
            "type_name string, field string, declared string,"
            " spark_type string",
        )

    # -- SELECT <builtin_fn>(…) (reference DSL.md:213-233) -------------------
    def _select_function(self, stmt: "ir.SelectFunction"):
        """Route the reference's built-in function statements to the
        evaluation library: evaluate_model → the EVALUATE path;
        feature_importance → native importances (method recorded —
        'shap' resolves to the same exact attribution family EXPLAIN
        uses; sample_size is accepted and unused, importances are
        closed-form not sampled); compare_models → ranked metric table
        with each model evaluated on its OWN feature expressions."""
        from declarativeml_spark.ml import evaluate as E
        from declarativeml_spark.plans.builder import build_features

        kw = dict(stmt.kwargs)

        def need(key: str):
            if key not in kw:
                raise ValueError(
                    f"{stmt.func} requires argument {key!r}"
                )
            return kw.pop(key)

        if stmt.func == "evaluate_model":
            model = need("model_name")
            source = need("test_data")
            metrics = kw.pop("metrics", []) or []
            if isinstance(metrics, str):
                # a scalar 'accuracy' iterated char-wise would filter
                # every metric out and silently return {}
                metrics = [metrics]
            self._reject_extra_args(stmt.func, kw)
            return self._evaluate(
                ir.EvaluateModel(
                    model=model, source=source, metrics=list(metrics)
                )
            )
        if stmt.func == "feature_importance":
            model = need("model_name")
            method = kw.pop("method", None)
            kw.pop("sample_size", None)  # accepted per the reference
            self._reject_extra_args(stmt.func, kw)
            if method not in (None, "shap", "native", "impurity"):
                raise ValueError(
                    f"Unknown feature_importance method {method!r};"
                    " accepted: shap, native, impurity"
                )
            meta = self._model_meta(model)
            if meta is None:
                raise ValueError(f"No registered model named {model!r}")
            return E.feature_importance(
                self.spark, model, meta["features"], base=self.model_dir
            )
        # compare_models
        models = kw.pop("models", None)
        trials_agent = kw.pop("trials", None)
        source = need("test_data")
        primary = need("primary_metric")
        self._reject_extra_args(stmt.func, kw)
        if models is None and trials_agent is None:
            raise ValueError(
                "compare_models needs models := ARRAY['m1', 'm2', …]"
                " and/or trials := 'tuner_agent'"
            )
        if models is not None and (
            not isinstance(models, (list, tuple)) or not models
        ):
            raise ValueError(
                "compare_models needs models := ARRAY['m1', 'm2', …]"
            )
        df = resolve_source(self.spark, source, True)
        specs = []
        frames = {}
        for m in models or ():
            meta = self._model_meta(m)
            if meta is None:
                raise ValueError(f"No registered model named {m!r}")
            specs.append(
                {
                    "name": m,
                    "algorithm": meta["algorithm"],
                    "target": meta["target"],
                }
            )
            frames[m] = build_features(df, meta["features"]).df
        # trials := 'agent' ranks the tuner's RECORDED search alongside
        # the models on the same surface (one ranked table, one primary
        # metric). Trial values come from the recorded search split —
        # the trial models themselves are not persisted, so they cannot
        # be re-evaluated on test_data; the name marks them as trials.
        extra = []
        ascending = None
        if trials_agent is not None:
            from declarativeml_spark.ml.models import trial_log_read

            rec = trial_log_read(trials_agent, base=self.model_dir)
            if rec is None:
                raise ValueError(
                    f"No recorded search for tuner agent {trials_agent!r}"
                    " — run the tuner first"
                )
            if rec["metric"] != primary:
                raise ValueError(
                    f"Tuner {trials_agent!r} recorded metric"
                    f" {rec['metric']!r}, not {primary!r} — compare on"
                    " the recorded metric"
                )
            if rec.get("maximize") is not None:
                rec_asc = not bool(rec["maximize"])
                from declarativeml_spark.ml.evaluate import LOWER_IS_BETTER

                heuristic_asc = primary in LOWER_IS_BETTER
                if specs and rec_asc != heuristic_asc:
                    raise ValueError(
                        f"Tuner {trials_agent!r} ranks {primary!r}"
                        f" {'ascending' if rec_asc else 'descending'} but"
                        " model comparison ranks it"
                        f" {'ascending' if heuristic_asc else 'descending'}"
                        " — rank trials alone or pick a consistent metric"
                    )
                ascending = rec_asc
            for t in rec["trials"]:
                val = float(t[rec["metric"]])
                extra.append(
                    (
                        f"{trials_agent}/trial{int(t['trial'])}",
                        rec["method"],
                        val,
                        {rec["metric"]: val},
                    )
                )
        return E.compare_models(
            self.spark,
            specs,
            frames,
            primary,
            base=self.model_dir,
            extra_rows=extra,
            ascending=ascending,
        )

    @staticmethod
    def _reject_extra_args(func: str, kw: dict) -> None:
        if kw:
            raise ValueError(
                f"{func} does not accept argument(s):"
                f" {', '.join(sorted(kw))}"
            )

    # -- ARCHIVE previous_version OF <model> ----------------------------------
    def _archive_version(self, stmt: "ir.ArchiveVersion") -> dict:
        """Mark the model's previous registry version ``archived``
        (bookkeeping status — the current version keeps serving, and a
        pinned load of the archived version still works)."""
        from declarativeml_spark.ml.models import (
            mark_version_status,
            version_statuses,
        )

        meta = self._model_meta(stmt.model)
        if meta is None:
            raise ValueError(f"No registered model named {stmt.model!r}")
        # "previous" means the newest OLDER live version — stamping
        # version-1 blindly would overwrite a rolled_back status with
        # archived, and the live filter (which only excludes
        # rolled_back) would make the bad version servable again
        statuses = version_statuses(stmt.model, self.model_dir)
        prev = next(
            (
                v
                for v in range(int(meta["version"]) - 1, 0, -1)
                if statuses.get(v, "registered") != "rolled_back"
            ),
            None,
        )
        if prev is None:
            return {"model": stmt.model, "archived": None,
                    "note": "no previous version"}
        mark_version_status(stmt.model, prev, "archived", self.model_dir)
        return {"model": stmt.model, "archived": prev}

    # -- WHEN ... THEN <statement(s)> -----------------------------------------
    def _register_rule(self, stmt: ir.WhenRule):
        """Attach a reactive rule to the event bus: when a matching
        event arrives, the action executes (DSL.md:123-144). The
        action may be a SCRIPT (the reference's AND-chained THEN
        actions join with ';'), executed statement by statement."""
        from declarativeml_spark.dsl.parser import (
            parse_workflow_block_text,
            split_statements,
        )

        def fire(matched_df: DataFrame) -> None:
            txt = stmt.action.strip()
            if txt.upper().startswith("BEGIN"):
                self._run_workflow(parse_workflow_block_text(txt))
            else:
                for s in split_statements(txt):
                    self.execute(s)

        return self.bus.when(stmt.event_pattern, stmt.payload_predicate or "TRUE", fire)

    # -- BEGIN … END workflow execution (reference DSL.md:135-143) -------------
    def _run_workflow(self, block: "ir.WorkflowBlock") -> dict:
        """Execute a workflow block with a RESULT CONTEXT: after a
        (RE)TRAIN step, ``retraining_<metric>`` holds the fresh fit's
        metrics and ``previous_<metric>`` the prior registry version's
        — the variables the reference's IF guard reads
        (``IF retraining_accuracy < previous_accuracy * 0.95``).
        Model-implicit IF actions (ROLLBACK) bind to the block's
        latest trained model."""
        from declarativeml_spark.ml.models import (
            mark_version_status,
            registry_meta,
        )

        context: dict[str, float] = {}
        subject: Optional[str] = None
        log: dict[str, Any] = {"steps": [], "conditions": []}
        for step in block.steps:
            if isinstance(step, ir.IfStep):
                fired = self._eval_workflow_cond(step, context)
                log["conditions"].append(
                    {
                        "condition": f"{step.lhs} {step.op} {step.rhs}",
                        "fired": fired,
                    }
                )
                if not fired:
                    continue
                for act in step.actions:
                    if act[0] == "rollback":
                        if subject is None:
                            raise ValueError(
                                "ROLLBACK TO previous_version needs a"
                                " prior (RE)TRAIN step in the block to"
                                " bind the model"
                            )
                        meta = self._model_meta(subject)
                        mark_version_status(
                            subject,
                            int(meta["version"]),
                            "rolled_back",
                            self.model_dir,
                        )
                        log["steps"].append(f"rollback {subject}")
                    elif act[0] == "alert":
                        self.bus.publish(
                            "notification",
                            {"recipient": act[1], "message": act[2]},
                        )
                        log["steps"].append(f"alert {act[1]}")
                    else:  # ("stmt", text)
                        self.execute(act[1])
                        log["steps"].append(act[1].splitlines()[0][:60])
                continue
            _, text = step
            result = self.execute(text)
            log["steps"].append(text.splitlines()[0][:60])
            if isinstance(result, TrainedModel):
                subject = result.name
                for k, v in result.metrics.items():
                    if isinstance(v, (int, float)):
                        context[f"retraining_{k}"] = float(v)
                if result.version > 1:
                    prev = registry_meta(
                        result.name,
                        version=result.version - 1,
                        base=self.model_dir,
                    )
                    for k, v in (
                        prev.get("performance_metrics") or {}
                    ).items():
                        if isinstance(v, (int, float)):
                            context[f"previous_{k}"] = float(v)
        if self._bus is not None and self._bus._published:
            self._bus.dispatch_batch()
        return log

    def _eval_workflow_cond(self, step: "ir.IfStep", context: dict) -> bool:
        import operator as _op

        from declarativeml_spark.dsl.features import parse_feature_expr

        ops = {
            ">": _op.gt, ">=": _op.ge, "<": _op.lt,
            "<=": _op.le, "!=": _op.ne, "=": _op.eq,
        }
        lhs = self._eval_workflow_expr(parse_feature_expr(step.lhs), context)
        rhs = self._eval_workflow_expr(parse_feature_expr(step.rhs), context)
        return bool(ops[step.op](lhs, rhs))

    def _eval_workflow_expr(self, node, context: dict) -> float:
        from declarativeml_spark.dsl import features as FT

        if isinstance(node, FT.NumberLit):
            return float(node.value)
        if isinstance(node, FT.Identifier):
            key = ".".join(node.parts)
            if key not in context:
                avail = ", ".join(sorted(context)) or (
                    "none — did a (RE)TRAIN step run first?"
                )
                raise ValueError(
                    f"Unknown workflow variable {key!r}; available:"
                    f" {avail}"
                )
            return float(context[key])
        if isinstance(node, FT.Group):
            return self._eval_workflow_expr(node.inner, context)
        if isinstance(node, FT.Neg):
            return -self._eval_workflow_expr(node.operand, context)
        if isinstance(node, FT.BinOp):
            left = self._eval_workflow_expr(node.left, context)
            right = self._eval_workflow_expr(node.right, context)
            if node.op == "+":
                return left + right
            if node.op == "-":
                return left - right
            if node.op == "*":
                return left * right
            if right == 0:
                raise ValueError(
                    "Division by zero in workflow IF condition"
                )
            return left / right
        raise ValueError(
            f"Unsupported expression in workflow IF:"
            f" {type(node).__name__}"
        )

    # -- CREATE AGENT ---------------------------------------------------------
    def _register_agent(self, stmt: ir.Agent) -> ir.Agent:
        """Register an autonomous monitor agent (DSL.md:150-171). The
        schedule is advisory metadata; ``run_agents_once`` is the tick."""
        self.agents[stmt.name] = stmt
        return stmt

    def _register_tuner(self, stmt: ir.TunerAgent) -> ir.TunerAgent:
        """Register a hyperparameter-search agent (reference
        DSL.md:158-171). Registration validates the target model and
        method eagerly (a tuner for a model that was never trained is
        a statement error, not a deferred runtime surprise); the
        search itself runs on ``run_tuner`` — trials are full
        distributed fits, too expensive to fire as a statement side
        effect."""
        from declarativeml_spark.ml.tuning import _KNOWN_METHODS

        if stmt.method not in _KNOWN_METHODS:
            raise ValueError(
                f"Unknown optimization method {stmt.method!r}; accepted:"
                f" {', '.join(sorted(_KNOWN_METHODS))}"
            )
        meta = self._model_meta(stmt.model)
        if meta is None:
            raise ValueError(f"No registered model named {stmt.model!r}")
        if not meta.get("statement"):
            raise ValueError(
                f"Model {stmt.model!r} has no stored TRAIN statement for"
                " the tuner to re-execute"
            )
        self.tuners[stmt.name] = stmt
        return stmt

    def run_tuner(self, name: str) -> DataFrame:
        """Execute a registered tuner agent's search: a deterministic
        budget-capped trial lattice fit through TrainValidationSplit
        with ``parallelism`` = the statement's worker count
        (ml/tuning.py). The best trial's model registers as a new
        version of the base model; per-trial metrics append to the
        registry audit log (``tuning_trials``). Returns the ranked
        trials DataFrame."""
        from declarativeml_spark.ml.tuning import run_search

        tuner = self.tuners.get(name)
        if tuner is None:
            raise ValueError(f"Unknown tuner agent {name!r}")
        meta = self._model_meta(tuner.model)
        if meta is None:
            raise ValueError(f"No registered model named {tuner.model!r}")
        trials_df, _best = run_search(
            self.spark, tuner, meta, model_dir=self.model_dir
        )
        return trials_df

    def tuning_trials(self, agent: str) -> DataFrame:
        """The latest recorded search for an agent as a DataFrame —
        one row per trial ranked by the objective (the registry
        audit-log surface of DSL.md:215-233's model-inspection
        family)."""
        from declarativeml_spark.ml.models import trial_log_read

        rec = trial_log_read(agent, base=self.model_dir)
        if rec is None:
            raise ValueError(
                f"No recorded search for tuner agent {agent!r} — run"
                " Engine.run_tuner first"
            )
        metric = rec["metric"]
        # the recorded direction is authoritative — a fresh session has
        # no tuner registry, and a wrong default would rank a MINIMIZE
        # search worst-first; the session registry is only a fallback
        # for logs written before the field existed
        maximize = rec.get("maximize")
        if maximize is None:
            tuner = self.tuners.get(agent)
            maximize = tuner.maximize if tuner is not None else True
        trials = sorted(
            rec["trials"], key=lambda t: t[metric], reverse=maximize
        )
        rows = [
            (
                rank + 1,
                int(t["trial"]),
                {k: str(v) for k, v in t["params"].items()},
                float(t[metric]),
                t["trial"] == rec["best_trial"],
            )
            for rank, t in enumerate(trials)
        ]
        return self.spark.createDataFrame(
            rows,
            f"rank int, trial int, params map<string,string>,"
            f" {metric} double, best boolean",
        )

    def _schedule_retraining(self, stmt: "ir.ScheduleRetraining") -> dict:
        """Record when the model is due for retraining (README.md:57's
        post-deploy clause). ADVISORY metadata: it does not fire a
        RETRAIN by itself — a host scheduler reads
        ``Engine.retrain_schedules`` (this session) or the persisted
        ``retrain_schedule`` registry records (any session) and issues
        the RETRAIN statement when due."""
        import time as _time

        from declarativeml_spark.ml.ensemble import _append_record

        if self._model_meta(stmt.model) is None:
            raise ValueError(f"No registered model named {stmt.model!r}")
        rec = {
            "model": stmt.model,
            "in_n": stmt.n,
            "unit": stmt.unit,
            "scheduled_at": _time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", _time.gmtime()
            ),
        }
        self.retrain_schedules[stmt.model] = rec
        # durable form: survives the session like all model metadata
        _append_record(
            self.model_dir,
            {"name": stmt.model, "record": "retrain_schedule", **rec},
        )
        return {"scheduled": "retraining", **rec}

    # -- trend agents (reference README.md:60-63) -------------------------------
    def _register_trend_agent(self, stmt: "ir.TrendAgent") -> "ir.TrendAgent":
        if self._model_meta(stmt.model) is None:
            raise ValueError(f"No registered model named {stmt.model!r}")
        # validate the WATCHED METRIC eagerly: an unknown metric is a
        # statement error at registration, not a surprise on every
        # subsequent tick (one monitor evaluation — registration is
        # rare; its value also seeds nothing, the history starts empty)
        res = self._monitor(
            ir.MonitorModel(model=stmt.model, source=None, checks=[])
        )
        if stmt.metric not in res["metrics"]:
            raise ValueError(
                f"Metric {stmt.metric!r} is not computed for"
                f" {stmt.model!r}; available:"
                f" {', '.join(sorted(res['metrics']))}"
            )
        self.agents[stmt.name] = stmt
        self._trend_history.pop(stmt.name, None)  # re-registration resets
        return stmt

    def _run_trend_agent(self, name: str, agent: "ir.TrendAgent") -> dict:
        """One tick: evaluate the watched metric on the model's stored
        TRAIN source, append to the agent's history, fire after k
        consecutive moves in the watched direction. Fired action names
        call registered procedures, else publish ``agent.action``."""
        res = self._monitor(
            ir.MonitorModel(model=agent.model, source=None, checks=[]),
            bus=self.bus,
        )
        value = res["metrics"].get(agent.metric)
        if value is None:
            raise ValueError(
                f"Metric {agent.metric!r} is not computed for"
                f" {agent.model!r}; available:"
                f" {', '.join(sorted(res['metrics']))}"
            )
        hist = self._trend_history.setdefault(name, [])
        hist.append(float(value))
        del hist[: -(agent.k + 1)]  # a window of k moves needs k+1 points
        moves = list(zip(hist, hist[1:]))
        if agent.direction == "increases":
            fired = len(hist) == agent.k + 1 and all(b > a for a, b in moves)
        else:
            fired = len(hist) == agent.k + 1 and all(b < a for a, b in moves)
        if fired:
            for act in agent.actions:
                fn = self.procedures.get(act)
                if fn is not None:
                    fn(self)
                else:
                    self.bus.publish(
                        "agent.action",
                        {"agent": name, "action": act, "model": agent.model},
                    )
            hist.clear()  # re-arm: a fresh streak is needed to re-fire
        return {
            "healthy": not fired,
            "fired": fired,
            "metric": agent.metric,
            agent.metric: float(value),
            "history_len": len(hist),
        }

    def _publish_converged(self, trained: TrainedModel) -> None:
        """Announce a successful fit as a ``model.converged`` event —
        the trigger for the reference's ``WHEN MODEL m CONVERGED``
        rules (README.md:54). Delivery also dispatches queued rules;
        nested publishes from fired actions queue for the NEXT
        dispatch (one snapshot per pass — a self-retriggering rule
        advances one step per dispatch, never recurses unboundedly)."""
        payload: dict[str, Any] = {
            "model": trained.name,
            "version": trained.version,
        }
        payload.update(
            {
                k: float(v)
                for k, v in trained.metrics.items()
                if isinstance(v, (int, float))
            }
        )
        self.bus.publish("model.converged", payload)
        self.bus.dispatch_batch()

    def register_procedure(self, name: str, fn) -> None:
        """Register a host callable for ``CALL <name>()`` and
        ``SUBSCRIBE TO '…' EXECUTE PROCEDURE <name>()`` — the
        extension point for event handlers the DSL can't express
        (AGENTS.md:49-51). The callable receives this engine."""
        if not callable(fn):
            raise TypeError(f"procedure {name!r} must be callable")
        self.procedures[name] = fn

    def run_agents_once(self) -> dict[str, dict]:
        """Run every registered agent's monitor; execute THEN actions
        for unhealthy models, publish alerts to the bus."""
        results: dict[str, dict] = {}
        # snapshot: an agent's THEN action may itself be CREATE AGENT
        # (or fire a rule that registers one) — mutating self.agents
        # mid-iteration would abort the whole tick with a RuntimeError
        for name, agent in list(self.agents.items()):
            if isinstance(agent, ir.TrendAgent):
                try:
                    results[name] = self._run_trend_agent(name, agent)
                except Exception as e:  # noqa: BLE001 — isolate agents
                    # one broken agent must not disable every OTHER
                    # agent's tick (or swallow their queued events)
                    results[name] = {"healthy": False, "error": str(e)}
                continue
            try:
                res = self._monitor(agent.monitor, bus=self.bus)
            except Exception as e:  # noqa: BLE001 — isolate agents
                # same isolation as the trend branch: a monitor whose
                # stored source vanished must not disable other
                # agents' ticks or strand their queued events
                results[name] = {"healthy": False, "error": str(e)}
                continue
            results[name] = res
            if not res["healthy"]:
                if agent.action:
                    self.execute(agent.action)
                # the reference form's THEN TRIGGER / AND NOTIFY
                # clauses publish bus events: a WHEN-rule (or an
                # external consumer) subscribes and runs the workflow
                if agent.trigger:
                    self.bus.publish(
                        "workflow.trigger",
                        {
                            "workflow": agent.trigger,
                            "agent": name,
                            "model": agent.monitor.model,
                        },
                    )
                if agent.notify:
                    self.bus.publish(
                        "notification",
                        {
                            "recipient": agent.notify,
                            "agent": name,
                            "model": agent.monitor.model,
                            "failed_checks": [
                                c for c, ok in res["checks"].items()
                                if not ok
                            ],
                        },
                    )
        # deliver any alert events to WHEN-rules
        if self._bus is not None and self._bus._published:
            self._bus.dispatch_batch()
        return results

    # -- CREATE FEATURE TRANSFORMER ------------------------------------------
    def _feature_transformer(self, stmt: ir.FeatureTransformer) -> DataFrame:
        """Named reusable feature view (DSL.md:79-86): the SELECT body
        becomes a temp view resolvable as a FROM source anywhere."""
        df = self.spark.sql(stmt.select_sql)
        df.createOrReplaceTempView(stmt.name)
        return df

    # -- DEPLOY MODELS (A/B) -----------------------------------------------------
    def _validate_ensemble(self, members: list, source: str) -> dict:
        """Score a freshly created ensemble on its VALIDATE ON source
        and return the standard metric set (keyed by the first
        member's algorithm family — create_ensemble enforces a shared
        feature spec, and members of one ensemble share a target)."""
        from declarativeml_spark.ml.ensemble import score_ensemble
        from declarativeml_spark.ml.registry import get_algorithm
        from declarativeml_spark.ml.training import _compute_metrics
        from declarativeml_spark.plans.builder import build_features

        meta = self._model_meta(members[0][0])
        if meta is None:
            raise ValueError(
                f"No registered model named {members[0][0]!r}"
            )
        spec = get_algorithm(meta["algorithm"])
        if spec.kind == "clustering":
            # score_ensemble keeps only input columns + the combined
            # prediction, so the members' assembled 'features' vector
            # (which ClusteringEvaluator needs) is gone by the time
            # metrics run — and a weighted average of cluster INDICES
            # is not a cluster assignment, so silhouette over it would
            # be meaningless even if the vector survived. Fail loudly
            # instead of returning {} (the "user believes the holdout
            # was scored while nothing ran" failure this clause is
            # here to prevent).
            raise ValueError(
                "VALIDATE ON is unsupported for clustering ensembles:"
                " averaged cluster indices have no silhouette —"
                " validate each member with EVALUATE MODEL instead"
            )
        df = resolve_source(self.spark, source, True)
        df = build_features(df, meta["features"]).df
        # clustering raised above, so a label always exists here
        label_col = "label"
        ttype = dict(df.dtypes).get(meta["target"])
        if not (spec.kind == "classification" and ttype == "string"):
            df = df.withColumn(
                label_col, F.col(meta["target"]).cast("double")
            )
        scored = score_ensemble(
            self.spark, members, df, base=self.model_dir
        )
        return _compute_metrics(None, df, spec, label_col, scored=scored)

    def _deploy_ab(self, stmt: ir.DeployABTest) -> dict:
        from declarativeml_spark.ml.ensemble import _append_record

        for m in stmt.models:
            if self._model_meta(m) is None:
                raise ValueError(f"No registered model named {m!r}")
        record = {
            "name": stmt.endpoint or "__ab__" + "_".join(stmt.models),
            "algorithm": "ab_test",
            "ab_models": stmt.models,
            "traffic_split": stmt.split or [100.0 / len(stmt.models)] * len(stmt.models),
            "track_metrics": stmt.track_metrics,
            "promote": stmt.promote,
            "promote_after": stmt.promote_after,
            "status": "deployed",
            "version": 1,
        }
        _append_record(self.model_dir, record)
        return record

    # -- MONITOR MODEL -------------------------------------------------------------
    def _monitor(self, stmt: ir.MonitorModel, bus=None) -> dict:
        from declarativeml_spark.ml.ensemble import monitor_model
        from declarativeml_spark.plans.builder import build_features

        meta = self._model_meta(stmt.model)
        if meta is None:
            raise ValueError(f"No registered model named {stmt.model!r}")
        if stmt.source is None:
            # the reference's FOR MODEL agent form names no data:
            # monitor on the model's own stored TRAIN source, resolved
            # at run time (the RETRAIN pattern)
            if not meta.get("statement"):
                raise ValueError(
                    f"Model {stmt.model!r} has no stored TRAIN statement"
                    " — name a source explicitly (MONITOR MODEL … ON"
                    " <source>)"
                )
            train_stmt = parse(meta["statement"])
            source, is_ident = (
                train_stmt.source,
                train_stmt.source_is_identifier,
            )
        else:
            source, is_ident = stmt.source, stmt.source_is_identifier
        df = resolve_source(self.spark, source, is_ident)
        df = build_features(df, meta["features"]).df
        return monitor_model(
            self.spark,
            stmt.model,
            df,
            target=meta["target"],
            algorithm=meta["algorithm"],
            checks=stmt.checks,
            base=self.model_dir,
            bus=bus,
        )

    # -- RETRAIN MODEL (with rollback, DSL.md:136-142) ---------------------------------
    def _retrain(self, stmt: ir.RetrainModel) -> TrainedModel:
        from declarativeml_spark.ml.models import mark_version_status

        meta = self._model_meta(stmt.model)
        if meta is None:
            raise ValueError(f"No registered model named {stmt.model!r}")
        if not meta.get("statement"):
            raise ValueError(
                f"Model {stmt.model!r} has no stored TRAIN statement to re-execute"
            )
        train_stmt = parse(meta["statement"])
        assert isinstance(train_stmt, ir.TrainModel)
        if stmt.latest_n is not None:
            if not stmt.time_column:
                raise ValueError(
                    "RETRAIN ... USING LATEST requires TIME COLUMN <col>"
                )
            # window the source relative to its own newest timestamp so
            # historical test data behaves like a live feed
            filt = (
                f"{stmt.time_column} >= (SELECT max({stmt.time_column})"
                f" FROM {train_stmt.source}) - INTERVAL {stmt.latest_n}"
                f" {stmt.latest_unit}"
            )
            if train_stmt.source_is_identifier:
                train_stmt.source = f"{train_stmt.source} WHERE {filt}"
                train_stmt.source_is_identifier = False
            else:
                # wrap, never splice: string-scanning for WHERE breaks
                # on subquery fragments ('(SELECT ... WHERE ...) s'
                # would get AND appended after the alias) and on
                # newline-separated clauses; double-nesting keeps the
                # result a pure '(SELECT ...) alias' fragment — valid
                # around ANY source resolve_source accepts, including
                # ones carrying their own WHERE tail
                train_stmt.source = (
                    f"(SELECT * FROM (SELECT * FROM {train_stmt.source})"
                    f" __retrain_inner WHERE {filt}) __retrain_window"
                )

        new = train(
            self.spark, train_stmt, model_dir=self.model_dir, statement=meta["statement"]
        )
        old_metrics = meta.get("performance_metrics") or {}
        rolled_back = False
        for key in ("accuracy", "f1", "r2"):  # higher-better metrics
            if key in old_metrics and key in new.metrics:
                if new.metrics[key] < stmt.rollback_ratio * old_metrics[key]:
                    rolled_back = True
                break
        else:
            if "rmse" in old_metrics and "rmse" in new.metrics:
                if new.metrics["rmse"] * stmt.rollback_ratio > old_metrics["rmse"]:
                    rolled_back = True
        if rolled_back:
            mark_version_status(stmt.model, new.version, "rolled_back", self.model_dir)
            new.stop_satisfied = False
        return new

    # -- PREDICT USING MODEL m FROM src [STORE RESULTS IN t] ----------------
    def _predict(self, stmt: ir.PredictModel) -> DataFrame:
        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        meta = self._model_meta(stmt.model)
        if meta is not None and meta.get("algorithm") == "ensemble":
            from declarativeml_spark.ml.ensemble import score_ensemble

            members = [
                (m["model"], m["weight"]) for m in meta["ensemble_members"]
            ]
            # member feature derivation: members share feature specs
            member_meta = self._model_meta(members[0][0])
            if member_meta is not None:
                from declarativeml_spark.plans.builder import build_features

                df = build_features(df, member_meta["features"]).df
            scored = score_ensemble(self.spark, members, df, base=self.model_dir)
        else:
            model = registry_load(self.spark, stmt.model, base=self.model_dir)
            # re-derive the feature columns the pipeline expects
            if meta is not None:
                from declarativeml_spark.plans.builder import build_features

                df = build_features(df, meta["features"]).df
            scored = model.transform(df)
        if stmt.sink:
            self._write_prediction_sink(scored, stmt.sink)
        return scored

    _PREDICTION_SINK_PROP = "declml.prediction_sink"

    def _write_prediction_sink(self, scored: DataFrame, sink: str) -> None:
        """Never-clobber sink write (the same discipline as
        _create_index/_train_tokenizer): overwrite only a name this
        path itself created (marked ``declml.prediction_sink``) or a
        name that does not exist. An unguarded overwrite-saveAsTable
        could silently destroy the index registry, a live index's
        bucketed storage, a tokenizer merge table, or any user
        table."""
        if sink == self.INDEX_REGISTRY_TABLE:
            # refused by NAME, not catalog existence — a fresh
            # catalog over a shared warehouse would otherwise pass
            # the exists check and clobber (or collide with) the
            # on-disk registry location
            raise ValueError(
                f"STORE RESULTS IN {sink!r}: that name is the"
                " engine's index registry — choose another name"
            )
        if self.spark.catalog.tableExists(sink):
            if self._is_index_storage(sink):
                raise ValueError(
                    f"STORE RESULTS IN {sink!r}: that table is engine"
                    " index storage — choose another name"
                )
            if not self._has_table_prop(sink, self._PREDICTION_SINK_PROP):
                raise ValueError(
                    f"STORE RESULTS IN {sink!r}: table exists and was"
                    " not created by a previous STORE RESULTS —"
                    " refusing to overwrite; DROP TABLE it first or"
                    " choose a new name"
                )
        scored.write.mode("overwrite").saveAsTable(sink)
        self.spark.sql(
            f"ALTER TABLE {sink} SET TBLPROPERTIES"
            f" ('{self._PREDICTION_SINK_PROP}'='1')"
        )

    def _evaluate(self, stmt: ir.EvaluateModel) -> dict:
        # delegate to the ONE evaluator (ml/evaluate.py): this body
        # used to be a verbatim copy whose label handling drifted —
        # the EVALUATE statement and the evaluate_model built-in must
        # stay behaviorally identical
        from declarativeml_spark.ml.evaluate import evaluate_model
        from declarativeml_spark.plans.builder import build_features

        meta = self._model_meta(stmt.model)
        if meta is None:
            raise ValueError(f"No registered model named {stmt.model!r}")
        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        df = build_features(df, meta["features"]).df
        return evaluate_model(
            self.spark,
            stmt.model,
            df,
            metrics=stmt.metrics,
            algorithm=meta["algorithm"],
            target=meta["target"],
            base=self.model_dir,
        )

    def _model_meta(self, name: str) -> Optional[dict[str, Any]]:
        """Latest live (non-rolled-back) full registry record for a
        model — the canonical lookup lives in ml/models.py so the
        engine and the streaming serving path resolve metadata
        identically (a second parsing loop here had drifted on
        rollback handling)."""
        from declarativeml_spark.ml.models import registry_meta

        rec = registry_meta(name, base=self.model_dir)
        return rec or None
