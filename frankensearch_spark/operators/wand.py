"""Block-Max WAND serving path (SURVEY.md E5/E6 — the north-rule centerpiece).

Distributed re-expression of the reference's Block-Max-WAND
(argus.rs:4474-4520, bound math contract.rs:333-370): instead of a scalar
cursor dance, pruning happens at **docid-bucket granularity**:

* every posting block belongs to one docid bucket (a deterministic docid
  range), and ALL terms' postings for a given doc live in the same bucket —
  so boolean logic, f32 clause-ordered scoring, and local top-k are
  bucket-local (embarrassingly parallel, one grouped-UDF task per bucket);
* per-bucket upper bound = conservative-envelope sum over scored clauses of
  the max block_max_score of that term's blocks in the bucket (decoded
  bounds never under-estimate: contract.rs:306-326, argus.rs:3918-3973);
  buckets missing a Must term are unmatchable and drop outright (the
  required-clause ordering of MaxScore, argus.rs:3034-3050, at bucket
  granularity) — so booleans prune too, not just flat bags of words;
* two phases: (A) score the best-bounded buckets exactly to certify a
  threshold θ = kth-best exact score, (B) decode only the remaining buckets
  whose bound ≥ θ.  Any doc in a skipped bucket scores ≤ bound < θ ≤ final
  kth score — rank-identity is a theorem, and the test suite asserts
  pruned ≡ exhaustive ≡ oracle on every fixture query (the reference's
  pruning-receipt discipline, index.rs:2434-2560);
* multi-field shapes (the reference's content + title^2 default surface)
  prune too: every field shares the one global docid space, so each
  field's blocks land in the same buckets — clauses become (field, term)
  pairs with per-field weights/avgdl, bucket bounds sum over them, and a
  Must term drops a bucket only when absent from ALL its fields.

Everything is distributed: per-bucket bounds are a grouped aggregate, the
seed ranking and every top-k merge is a ``TakeOrderedAndProject``, and
tombstones cogroup into their bucket's task — the driver only ever sees
O(seed + k) rows, never per-bucket metadata or winner sets (the round-1
driver-side collects are gone).

Everything score-bearing is numpy float32 in the pinned op order.
"""

from __future__ import annotations

import math
import threading
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frankensearch_spark.contract import (
    block_max_score,
    compute_avgdl,
    compute_tf_cache,
    score_total_order_key,
    term_weight,
)
from frankensearch_spark.operators.merge import (
    DEFAULT_BUCKET_SHIFT,
    decode_blocks_pdf,
    term_partition,
)
from frankensearch_spark.operators.query import QuerySpec


@dataclass
class ServingIndex:
    """Compressed, query-ready index: block table + stats + idmap."""

    blocks: DataFrame
    termstats: DataFrame
    docmeta: DataFrame
    fieldstats: DataFrame
    bucket_shift: int = DEFAULT_BUCKET_SHIFT
    n_term_partitions: int = 64
    tombstones: DataFrame | None = None
    has_positions: bool = False  # pos_bytes sidecar present in blocks
    _cached_stats: tuple[int, int] | None = None
    _term_df_cache: dict | None = None
    # MUST be a declared field: lifecycle ops clone the index via
    # dataclasses.replace(), which silently drops plain attributes — a
    # lost completeness flag over a PARTIAL cache would make tail terms
    # read as absent (silently wrong top-k).  False is the safe default:
    # it only costs a filtered collect for cache misses.
    _term_df_complete: bool = False
    # preload_bucket_coverage() planning stats (long-lived serving)
    # term -> (n_buckets, block-skippable fraction, max block shape);
    # the shape max is weight-independent (bound = weight × shape), so
    # MaxScore whole-list upper bounds come from it for free
    _bucket_cov: dict | None = None
    # completeness + truncation floor for the BOUNDED coverage cache —
    # declared fields for the same dataclasses.replace() law as
    # _term_df_complete: a dropped flag would make consumers read a
    # truncated cache as authoritative.  When incomplete, an absent
    # term is EVICTED-or-absent, not absent: its true bucket coverage
    # is provably ≤ _bucket_cov_min_nb (the smallest kept entry — the
    # cache keeps the top-max_terms BY coverage), which is the upper
    # bound the routing gates fall back to.
    _bucket_cov_complete: bool = False
    _bucket_cov_min_nb: int | None = None
    _total_buckets: int | None = None
    _phrase_wl_cache: dict | None = None  # rare-slot docid whitelists (FIFO)

    def stats(self) -> tuple[int, int]:
        if self._cached_stats is None:
            row = self.fieldstats.collect()[0]
            self._cached_stats = (int(row["doc_count"]), int(row["total_tokens"]))
        return self._cached_stats

    def preload_termstats(self, max_terms: int = 2_000_000) -> int:
        """Serving amortization: (term -> df) collected once per process,
        BOUNDED at the top-``max_terms`` by df — a 100-TB vocabulary is
        O(10^8-10^9) terms and a full collect is a driver OOM (see
        BuiltIndex.preload_termstats for the head/tail routing law)."""
        rows = (
            self.termstats.orderBy(F.desc("df"), F.asc("term"))
            .limit(max_terms)
            .collect()
        )
        self._term_df_cache = {r["term"]: int(r["df"]) for r in rows}
        self._term_df_complete = len(rows) < max_terms
        return len(self._term_df_cache)

    def preload_bucket_coverage(self, max_terms: int = 2_000_000) -> int:
        """Long-lived-serving planning statistic, one grouped pass over
        the block table per process: per term, (a) docid-bucket coverage
        and (b) bound FLATNESS — the q25/max ratio of the term's
        per-BLOCK block-max score shape (weight-independent: computed
        at weight 1 with the snapshot avgdl, and every real bound is
        weight × shape).  Flatness is measured at 128-posting BLOCK
        granularity, not per bucket: since the kernel skips individual
        blocks under θ (argus.rs:4474-4520 granularity), a df≈N term
        whose bucket bounds are flat but whose blocks vary in
        (max_tf, min_fieldnorm) is still prunable, and the gate must
        not route it to the exhaustive pass.

        BOUNDED like ``preload_termstats`` (the same 100-TB-vocabulary
        driver-OOM law — and since round 5 the engine SELF-warms on
        first search, so this collect must be safe unconditionally):
        the cache keeps the top-``max_terms`` by bucket coverage — the
        wide-coverage head is what the dispersion/coverage gates and
        MaxScore bounds need, and an EVICTED tail term is still usable
        by the routing gates because eviction itself is information:
        its true coverage is ≤ ``_bucket_cov_min_nb`` (the smallest
        kept entry), the upper bound `_coverage_gap` /
        `_must_coverage_frac` fall back to.  Consumers that need exact
        per-term values (MaxScore elimination) disable themselves on a
        miss.  Either way a miss only relaxes ROUTING, never ranks.

        This is what lets :func:`wand_topk` decide BEFORE paying for the
        distributed bound pass whether pruning can possibly skip work:
        coverage gaps are the buckets the Must rule / θ-bounds can drop,
        and per-block shape variation (doc-length or tf skew) is what
        lets θ clear blocks even at full coverage.  Only when every
        clause term covers ~every bucket WITH near-identical per-block
        shape is the bound distribution provably flat.  The reference
        reads the same signals for free from its mmap'd block-max
        section; one cached job is the Spark-native analogue."""
        doc_count, total_tokens = self.stats()
        avgdl = float(compute_avgdl(total_tokens, doc_count))

        def shape(pdfs):
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                s = block_max_score(
                    pdf["mtc"].to_numpy(dtype=np.int64),
                    pdf["mfn"].to_numpy(dtype=np.int64),
                    np.float32(avgdl),
                    np.float32(1.0),
                )
                yield pd.DataFrame(
                    {
                        "term": pdf["term"],
                        "bucket": pdf["bucket"],
                        "shape": s.astype(np.float64),
                    }
                )

        per_block = self.blocks.select(
            "term",
            "bucket",
            F.col("max_tf_code").alias("mtc"),
            F.col("min_fieldnorm_id").alias("mfn"),
        )
        rows = (
            per_block.mapInPandas(
                shape, "term string, bucket long, shape double"
            )
            .groupBy("term")
            .agg(
                F.countDistinct("bucket").alias("nb"),
                F.max("shape").alias("mx"),
                F.expr(SHAPE_QUANTILE_SQL).alias("qs"),
            )
            .orderBy(F.desc("nb"), F.asc("term"))
            .limit(max_terms)
            .collect()
        )
        # per term: (bucket coverage, estimated block-skippable fraction,
        # whole-list max bound shape — MaxScore's U_t at weight 1)
        self._bucket_cov = {
            r["term"]: (
                int(r["nb"]),
                _frac_low(r["qs"], r["mx"]),
                float(r["mx"]) if r["mx"] is not None else None,
            )
            for r in rows
        }
        self._bucket_cov_complete = len(rows) < max_terms
        self._bucket_cov_min_nb = min(
            (e[0] for e in self._bucket_cov.values()), default=0
        )
        self._total_buckets = int(
            self.blocks.select("bucket").distinct().count()
        )
        return len(self._bucket_cov)

    def df_of_terms(self, terms: list[str]) -> dict[str, int]:
        if not terms:
            return {}
        cache = self._term_df_cache
        if cache is not None:
            if self._term_df_complete:
                return {t: cache[t] for t in terms if t in cache}
            # bounded preload: tail terms fall back to ONE filtered
            # collect and are folded in (df==0 negative-caches misses)
            hits = {t: cache[t] for t in terms if cache.get(t)}
            missing = [t for t in terms if t not in cache]
            if not missing:
                return hits
            fetched = {
                r["term"]: int(r["df"])
                for r in self.termstats.filter(
                    F.col("term").isin(missing)
                ).collect()
            }
            for t in missing:
                cache[t] = fetched.get(t, 0)
            hits.update(fetched)
            return hits
        return {
            r["term"]: int(r["df"])
            for r in self.termstats.filter(F.col("term").isin(terms)).collect()
        }


@dataclass
class ServingMultiIndex:
    """Several single-field serving indexes over ONE docid space (the
    durable form of MultiFieldIndex — content + title^2 etc.).

    Per-field blocks/termstats/fieldstats; docmeta, tombstones and the
    global doc_count come from the primary field."""

    fields: dict[str, ServingIndex]
    primary_name: str
    field_cols: dict[str, str] | None = None  # field -> source column
    # (persisted in the root manifest so loaded engines can upsert)

    @property
    def primary(self) -> ServingIndex:
        return self.fields[self.primary_name]

    @property
    def docmeta(self):
        return self.primary.docmeta

    @property
    def tombstones(self):
        return self.primary.tombstones

    @property
    def termstats(self):
        # primary-field stats (content-based snippet weighting)
        return self.primary.termstats

    def stats(self) -> tuple[int, int]:
        return self.primary.stats()

    def preload_termstats(self) -> int:
        return sum(f.preload_termstats() for f in self.fields.values())

    def preload_bucket_coverage(self) -> int:
        return sum(
            f.preload_bucket_coverage() for f in self.fields.values()
        )


def serving_from_built(built, bucket_shift: int = DEFAULT_BUCKET_SHIFT,
                       n_term_partitions: int = 64, cache: bool = True,
                       with_positions: bool = True,
                       codec: str = "vint") -> ServingIndex:
    from frankensearch_spark.operators.merge import build_blocks

    positions = built.positions if with_positions else None
    full = getattr(built, "postings_full", None)
    blocks = build_blocks(
        built.postings if (full is None or positions is None) else full,
        bucket_shift, n_term_partitions, positions=positions,
        aligned_shift=getattr(built, "bucket_aligned_shift", None),
        codec=codec,
    )
    if cache:
        blocks = blocks.persist()
    return ServingIndex(
        blocks, built.termstats, built.docmeta, built.fieldstats,
        bucket_shift, n_term_partitions, built.tombstones,
        has_positions=positions is not None,
    )


def _clause_mult(spec: QuerySpec) -> dict:
    """term -> scored-clause multiplicity ('+foo foo' counts foo twice,
    matching the exact scorers' clause loop and the bucket bound)."""
    mult: dict = {}
    for t in spec.clause_terms():
        mult[t] = mult.get(t, 0) + 1
    return mult


_F32_EPS = float(np.finfo(np.float32).eps)


def _maxscore_split(spec: QuerySpec, weights: dict, tf_order: dict,
                    fidx: dict, theta: float) -> set:
    """Term-level MaxScore split (argus.rs:29,4463-4485): the set of
    NON-essential scored terms under the certified θ.

    The reference's MaxScore sorts clause terms ascending by whole-list
    upper bound and stops advancing the low-weight cursors once θ
    exceeds their residual sum — documents found ONLY in those lists can
    never reach the top-k.  The Spark analogue: a term t's whole-list
    bound is ``Σ_fields mult_t · weight_{f,t} · max_block_shape_{f,t}``
    (the shape max is cached weight-independent by
    ``preload_bucket_coverage``; ``bound = weight × shape`` since
    block_max_score is linear in the weight).  The longest ascending
    prefix whose f32-envelope-inflated cumulative sum stays BELOW θ is
    non-essential: a doc with postings only in those lists scores at
    most that cumsum < θ, while the merge already holds k exact scores
    ≥ θ from the seed phase — dropping it cannot change the top-k.

    Returns the non-essential term set; empty when the split cannot be
    certified (preload missing, any scored term's shape unknown, θ not
    finite, or the reference's 2..=8 direct-term gate unmet).  Only
    pure-Should shapes qualify: Must terms already gate candidacy and
    MustNot exclusions must see every candidate."""
    if not math.isfinite(theta) or theta <= 0.0:
        return set()
    if spec.must or spec.must_not:
        return set()
    terms = list(dict.fromkeys(spec.clause_terms()))
    if not 2 <= len(terms) <= 8:
        return set()
    mult = _clause_mult(spec)
    u: dict = {}
    n_contrib = 0
    for t in terms:
        tot = 0.0
        any_field = False
        for f in tf_order.get(t, ()):
            w = weights.get((f, t))
            if w is None:
                continue
            cov = getattr(fidx.get(f), "_bucket_cov", None)
            ent = cov.get(t) if cov else None
            mx = ent[2] if ent is not None and len(ent) > 2 else None
            if mx is None:
                return set()  # cannot certify this term's bound
            tot += float(w) * float(mx)
            any_field = True
            n_contrib += mult.get(t, 0)
        if not any_field:
            continue  # unscored term (absent everywhere): contributes 0
        u[t] = tot * mult.get(t, 0)
    if len(u) < 2:
        return set()
    infl = 1.0 + _F32_EPS * max(n_contrib, 1)
    non_essential: set = set()
    acc = 0.0
    for t in sorted(u, key=lambda t: (u[t], t)):
        acc += u[t]
        if acc * infl >= theta:
            break
        non_essential.add(t)
    if len(non_essential) == len(u):
        # θ above the sum of every bound can't happen for a real θ; be
        # safe and keep at least the largest-bound term essential
        non_essential.discard(max(u, key=lambda t: (u[t], t)))
    return non_essential


def _block_keep_mask(pdf: pd.DataFrame, theta: float, weights: dict,
                     avgdls: dict, mult: dict,
                     bucket_shift: int) -> np.ndarray:
    """BLOCK-granular θ mask over one bucket's block rows — the
    reference's native Block-Max-WAND granularity (argus.rs:4474-4520,
    quiver.rs:1719-1930), which bucket-level bounds alone cannot reach:
    a df≈N term on an i.i.d. corpus has flat BUCKET bounds but its
    128-posting blocks still vary in (max_tf, min_fieldnorm).

    Within the bucket each (field, term)'s blocks tile contiguous docid
    sub-ranges ``[first_doc_i, first_doc_{i+1})`` (different segments'
    docid leases are disjoint intervals, so sorting by first_doc only
    OVER-covers inter-segment gaps — bound-safe).  The per-doc upper
    bound is the f64 interval-sum of the covering blocks' conservative
    bounds with clause multiplicity, inflated by the same ``n·eps``
    envelope as :func:`contract.conservative_bound_sum` so it dominates
    every f32 accumulation order.  ANY block — scored or not (must_not,
    zero-weight) — whose covered region tops out below θ is dropped:
    every doc it covers is provably below the certified kth score, so
    losing its contributions (or its exclusions) cannot change the
    top-k.  A dropped doc may still receive PARTIAL contributions from
    kept blocks of other terms; its partial f32 score ≤ its true score
    ≤ its bound < θ, and the final merge already holds k exact scores
    ≥ θ from the seed phase, so the straggler is cut — rank identity is
    preserved (pinned by test_wand's pruned ≡ exhaustive ≡ oracle).
    """
    m = len(pdf)
    span = 1 << bucket_shift
    base = int(pdf["bucket"].iat[0]) << bucket_shift
    firsts = pdf["first_doc"].to_numpy(dtype=np.int64) - base
    terms = pdf["term"].to_numpy(dtype=object)
    fields = pdf["field"].to_numpy(dtype=object)
    mtc = pdf["max_tf_code"].to_numpy(dtype=np.int64)
    mfn = pdf["min_fieldnorm_id"].to_numpy(dtype=np.int64)

    groups: dict = {}
    for i in range(m):
        groups.setdefault((fields[i], terms[i]), []).append(i)

    diff = np.zeros(span + 1, dtype=np.float64)
    n_contrib = 0
    tiled: list = []  # (rows sorted by first, starts) for phase 2
    for (f, t), rows_l in groups.items():
        rows_a = np.asarray(rows_l, dtype=np.int64)
        order = np.argsort(firsts[rows_a], kind="stable")
        rows_a = rows_a[order]
        starts = np.clip(firsts[rows_a], 0, span - 1)
        degenerate = starts.size > 1 and bool(np.any(np.diff(starts) <= 0))
        w = weights.get((f, t))
        mm = mult.get(t, 0)
        if w is not None and mm:
            b = block_max_score(
                mtc[rows_a], mfn[rows_a], avgdls[f], w
            ).astype(np.float64) * mm
            n_contrib += mm
            if degenerate:
                # overlapping first_docs (shouldn't happen for healthy
                # segments): one flat max bound over the group's span
                diff[int(starts[0])] += float(b.max())
            else:
                ends = np.append(starts[1:], span)
                np.add.at(diff, starts, b)
                np.add.at(diff, ends, -b)
        if not degenerate:
            tiled.append((rows_a, starts))
    ub = np.cumsum(diff[:span])
    # f32 any-order summation envelope (conservative_bound_sum's law)
    ub += np.abs(ub) * (_F32_EPS * max(n_contrib, 1))
    keep = np.ones(m, dtype=bool)
    for rows_a, starts in tiled:
        seg_max = np.maximum.reduceat(ub, starts)
        keep[rows_a] = seg_max >= theta
    return keep


def _row_group_ids(part_pdf: pd.DataFrame, gid_of: dict) -> np.ndarray:
    """Small-int (field, term) group id per BLOCK row, interned into the
    shared ``gid_of`` dict — block rows are few (tens per bucket), so the
    Python loop is cheap, and downstream posting selection becomes an
    integer compare instead of two object-dtype string compares."""
    ts = part_pdf["term"].to_numpy(dtype=object)
    fs = part_pdf["field"].to_numpy(dtype=object)
    out = np.empty(len(part_pdf), dtype=np.int32)
    for i in range(len(part_pdf)):
        key = (fs[i], ts[i])
        g = gid_of.get(key)
        if g is None:
            g = len(gid_of)
            gid_of[key] = g
        out[i] = g
    return out


def _candidate_block_mask(ne_pdf: pd.DataFrame, cand_mask: np.ndarray,
                          base: int, bucket_shift: int) -> np.ndarray:
    """Keep mask over NON-essential block rows: a block decodes only when
    its covered docid segment ``[first_doc_i, first_doc_{i+1})`` (per
    (field, term) group, the same over-covering tiling as
    :func:`_block_keep_mask`) contains at least one candidate doc.  A
    candidate's own posting block always survives: postings are docid-
    sorted, so the block holding docid d covers a segment containing d.
    Degenerate tilings (overlapping first_docs) keep the whole group."""
    m = len(ne_pdf)
    if m == 0:
        return np.ones(0, dtype=bool)
    span = 1 << bucket_shift
    pre = np.concatenate(([0], np.cumsum(cand_mask, dtype=np.int64)))
    firsts = ne_pdf["first_doc"].to_numpy(dtype=np.int64) - base
    terms = ne_pdf["term"].to_numpy(dtype=object)
    fields = ne_pdf["field"].to_numpy(dtype=object)
    keep = np.ones(m, dtype=bool)
    groups: dict = {}
    for i in range(m):
        groups.setdefault((fields[i], terms[i]), []).append(i)
    for rows_l in groups.values():
        rows_a = np.asarray(rows_l, dtype=np.int64)
        order = np.argsort(firsts[rows_a], kind="stable")
        rows_a = rows_a[order]
        starts = np.clip(firsts[rows_a], 0, span)
        if starts.size > 1 and bool(np.any(np.diff(starts) <= 0)):
            continue  # degenerate: keep all (safe)
        ends = np.append(starts[1:], span)
        keep[rows_a] = pre[ends] > pre[starts]
    return keep


def _score_buckets_kernel(spec: QuerySpec, weights: dict, tf_caches: dict,
                          k: int, bucket_shift: int, term_fields: dict,
                          theta: float = -math.inf,
                          avgdls: dict | None = None,
                          non_essential: set | None = None):
    """Per-bucket scoring kernel -> local top-k rows.

    Dense bucket-local accumulation (bucket span is bounded by
    2**bucket_shift) mirrors the oracle's clause-ordered f32 arithmetic:
    clause outer loop (Must then Should), field inner loop in the
    query's field order — exactly the kernel's ``_eval_term`` nesting,
    so multi-field (content + title^2) scores are bit-identical.
    ``weights`` is keyed ``(field, term)``; ``tf_caches`` maps field ->
    its snapshot tf cache; ``term_fields`` maps term -> ordered field
    names.  Returned as (groupBy fn, cogroup fn): the cogroup variant
    receives the bucket's tombstoned docids as the right frame — no
    driver closure.
    """
    must = list(spec.must)
    must_not = list(spec.must_not)
    clause_terms = spec.clause_terms()
    span = 1 << bucket_shift
    mult = _clause_mult(spec)
    ne_terms = set(non_essential or ())

    def score_one(pdf, tomb=None):
        if len(pdf) == 0:
            return pd.DataFrame({"docid": [], "score": []})
        if theta != -math.inf:
            # block-granular θ skip BEFORE any decode: the mask is
            # metadata-only, so a pruned block costs one bound compare
            # instead of a vbyte decode + scoring pass
            keepm = _block_keep_mask(
                pdf, theta, weights, avgdls, mult, bucket_shift
            )
            if not keepm.all():
                pdf = pdf[keepm]
            if len(pdf) == 0:
                return pd.DataFrame({"docid": [], "score": []})
        base = int(pdf["bucket"].iat[0]) << bucket_shift
        cand_mask = None
        if ne_terms and theta != -math.inf:
            # term-level MaxScore (argus.rs:4463-4485): candidates are
            # generated ONLY from the essential lists — decode them
            # first, then decode a non-essential block only when its
            # covered docid segment holds at least one candidate (the
            # distributed analogue of "seek the low-weight cursor to the
            # next candidate" — blocks between candidates never decode).
            # Docs with no essential posting score ≤ the split's
            # inflated cumsum < θ, and the merge holds k exact scores
            # ≥ θ from the seed phase, so the gating is rank-exact.
            tarr = pdf["term"].to_numpy(dtype=object)
            ne_sel = np.array([t in ne_terms for t in tarr], dtype=bool)
            ess_pdf = pdf[~ne_sel]
            if len(ess_pdf) == 0:
                return pd.DataFrame({"docid": [], "score": []})
            d1, t1, f1, r1 = decode_blocks_pdf(ess_pdf, bucket_shift)
            if d1.size == 0:
                return pd.DataFrame({"docid": [], "score": []})
            cand_mask = np.zeros(span, dtype=bool)
            cand_mask[(d1 - base).astype(np.int64)] = True
            ne_pdf = pdf[ne_sel]
            keep_ne = _candidate_block_mask(
                ne_pdf, cand_mask, base, bucket_shift
            )
            if not keep_ne.all():
                ne_pdf = ne_pdf[keep_ne]
            if len(ne_pdf):
                d2, t2, f2, r2 = decode_blocks_pdf(ne_pdf, bucket_shift)
            else:
                d2 = np.zeros(0, dtype=d1.dtype)
                t2 = np.zeros(0, dtype=t1.dtype)
                f2 = np.zeros(0, dtype=f1.dtype)
                r2 = np.zeros(0, dtype=np.int64)
            docids = np.concatenate([d1, d2])
            tfs = np.concatenate([t1, t2])
            fids = np.concatenate([f1, f2])
            gid_of: dict = {}
            post_gids = np.concatenate([
                _row_group_ids(ess_pdf, gid_of)[r1],
                _row_group_ids(ne_pdf, gid_of)[r2],
            ])
        else:
            docids, tfs, fids, rows = decode_blocks_pdf(pdf, bucket_shift)
            if docids.size == 0:
                return pd.DataFrame({"docid": [], "score": []})
            gid_of = {}
            post_gids = _row_group_ids(pdf, gid_of)[rows]
        offs = (docids - base).astype(np.int64)

        acc = np.zeros(span, dtype=np.float32)
        matched = np.zeros(span, dtype=bool)
        must_ok = np.ones(span, dtype=bool) if must else None
        seen = np.zeros(span, dtype=bool)
        seen[offs] = True

        def term_sel(term):
            """Postings of ``term`` in any of ITS queried fields —
            integer group-id compares (the object-dtype string compare
            this replaces was the kernel's hottest line: ~2 object
            compares per posting per clause term)."""
            sel = np.zeros(len(post_gids), dtype=bool)
            for f in term_fields.get(term, ()):
                g = gid_of.get((f, term))
                if g is not None:
                    sel |= post_gids == g
            return sel

        for term in dict.fromkeys(must):
            o = offs[term_sel(term)]
            hit = np.zeros(span, dtype=bool)
            hit[o] = True
            must_ok &= hit
        for term in clause_terms:
            # EXACT kernel nesting (_eval_boolean -> _eval_term): each
            # clause's multi-field subtotal accumulates in f32 FIRST,
            # then the subtotal adds to the clause accumulator.  Folding
            # fields straight into ``acc`` changes the f32 association —
            # ((acc+s_content)+s_title) vs (acc+(s_content+s_title)) —
            # and diverges from the oracle by 1 ULP on real corpora
            # (caught by fuzz seed 7: 'search ownership' et al.)
            term_acc = np.zeros(span, dtype=np.float32)
            term_hit = False
            for fname in term_fields.get(term, ()):
                w = weights.get((fname, term))
                if w is None:
                    continue
                g = gid_of.get((fname, term))
                sel = post_gids == g if g is not None else None
                if sel is None or not sel.any():
                    continue
                o = offs[sel]
                f = tfs[sel].astype(np.float32)
                norm = tf_caches[fname][fids[sel].astype(np.int64)]
                s = (np.float32(w) * f / (f + norm)).astype(np.float32)
                term_acc[o] = (term_acc[o] + s).astype(np.float32)
                term_hit = True
                if term in spec.should:
                    matched[o] = True
            if term_hit:
                # dense add: x + 0.0 is exact in IEEE, so untouched docs
                # keep their bits while matched docs get the kernel's
                # (acc + term_subtotal) association
                acc = (acc + term_acc).astype(np.float32)

        ok = must_ok if must else matched
        ok = ok & seen
        if cand_mask is not None:
            # MaxScore: only essential-list docs are candidates
            ok = ok & cand_mask
        for term in must_not:
            ok = ok.copy()
            ok[offs[term_sel(term)]] = False
        if tomb is not None and len(tomb):
            local = tomb["docid"].to_numpy(dtype=np.int64) - base
            local = local[(local >= 0) & (local < span)]
            if local.size:
                ok = ok.copy()
                ok[local] = False

        hit_offs = np.nonzero(ok)[0]
        if hit_offs.size == 0:
            return pd.DataFrame({"docid": [], "score": []})
        scores = acc[hit_offs]
        out_docids = base + hit_offs
        order = score_total_order_key(scores, out_docids)[:k]
        return pd.DataFrame(
            {
                "docid": out_docids[order].astype(np.int64),
                "score": scores[order],
            }
        )

    def score_grouped(pdf):
        # single-arg wrapper: a 2-arg fn would be read as (key, pdf)
        return score_one(pdf)

    def score_cogrouped(blocks_pdf, tomb_pdf):
        return score_one(blocks_pdf, tomb_pdf)

    return score_grouped, score_cogrouped


def _jvm_bucket_bounds(meta: DataFrame, must_set: set, weights: dict,
                       avgdls: dict, mult: dict) -> DataFrame:
    """Phase-A per-bucket conservative bounds as pure whole-stage
    codegen — NO Python stage (round 3; the pandas kernel this replaces
    cost an ArrowEvalPython round trip on the θ path's critical chain).

    Per aggregated (bucket, field, term) metadata row the contribution
    is ``mult_t · w_{f,t} · fmax(mtc) / (fmax(mtc) + norm_f(mfn))``
    (contract.rs:335-367 block bound): ``w``/``mult`` ride a per-group
    broadcast LUT, ``norm`` a 256-row per-field LUT of the f32
    ``cached_tf_component`` values.  The f64 product is inflated by one
    f32 ulp so it upper-bounds the kernel's f32 ``block_max_score``
    (whose rounding can land ON the achievable score); the per-bucket
    sum then takes the ``n·eps`` any-order envelope
    (conservative_bound_sum's law, argus.rs:3918-3973) — so every
    emitted bound dominates every possible f32 accumulation of true
    scores, and θ-pruning on it stays rank-safe.

    CLAUSE MULTIPLICITY is preserved (``mult``): the exact scorers
    accumulate a term once per scored clause ('+foo foo' adds foo
    twice); deduplicating would halve the bound and let θ skip buckets
    holding true top-k docs (the round-2 adversarial test).

    Buckets missing any Must term (absent from EVERY queried field)
    drop via the distinct-present-must-terms count — the
    bucket-granular required-clause rule.  Emits
    (bucket, bound, n_postings), same contract as the old kernel."""
    from frankensearch_spark.contract import (
        cached_tf_component,
        id_to_fieldnorm,
    )

    spark = meta.sparkSession
    wrows = [
        (f, t, float(w), int(mult.get(t, 0)), t in must_set)
        for (f, t), w in weights.items()
    ]
    wlut = spark.createDataFrame(
        wrows,
        "field string, term string, w double, mult int, is_must boolean",
    )
    nrows = []
    for f, avgdl in avgdls.items():
        norms = cached_tf_component(
            id_to_fieldnorm(np.arange(256, dtype=np.int64)), avgdl
        )
        nrows.extend((f, int(i), float(norms[i])) for i in range(256))
    nlut = spark.createDataFrame(nrows, "field string, mfn int, norm double")
    j = (
        meta.join(F.broadcast(wlut), ["field", "term"], "left")
        .join(F.broadcast(nlut), ["field", "mfn"], "left")
    )
    fmax = (
        F.when(F.col("mtc") >= 255, F.lit(4294967295.0))
        .otherwise(F.col("mtc").cast("double"))
    )
    b = F.when(F.col("mtc") <= 0, F.lit(0.0)).otherwise(
        F.col("w") * fmax / (fmax + F.col("norm"))
    )
    contrib = F.coalesce(
        b * F.col("mult") * F.lit(1.0 + 2.0 * _F32_EPS), F.lit(0.0)
    )
    agg = j.groupBy("bucket").agg(
        F.sum(contrib).alias("b0"),
        F.coalesce(F.sum("mult"), F.lit(0)).alias("ncon"),
        F.count_distinct(
            F.when(F.col("is_must"), F.col("term"))
        ).alias("nmust"),
        F.sum("n_postings").alias("n_postings"),
    )
    if must_set:
        agg = agg.filter(F.col("nmust") == len(must_set))
    return agg.select(
        "bucket",
        (
            F.col("b0") * (F.lit(1.0) + F.lit(_F32_EPS) * F.col("ncon"))
        ).alias("bound"),
        "n_postings",
    )


def _single_term_stream_plan(cand: DataFrame, weight, tf_cache,
                             bucket_shift: int, want: int) -> DataFrame:
    """Exhaustive single-clause top-k WITHOUT the bucket exchange:
    decode + score each candidate block inside its scan partition, emit
    a partition-local top-``want``, merge via orderBy().limit() (a
    TakeOrderedAndProject — no full sort).  Valid only when one scored
    (field, term) clause exists, no MustNot, and no tombstones: then a
    doc's score is exactly its single posting's ``w·tf/(tf+norm)``
    (the kernel's one-clause reduction) and no accumulation across
    blocks can occur."""
    w = np.float32(weight)
    tfc = tf_cache

    def score_stream(pdfs):
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            docids, tfs, fids, _rows = decode_blocks_pdf(pdf, bucket_shift)
            if docids.size == 0:
                continue
            f = tfs.astype(np.float32)
            norm = tfc[fids.astype(np.int64)]
            s = (w * f / (f + norm)).astype(np.float32)
            order = score_total_order_key(s, docids)[:want]
            yield pd.DataFrame(
                {
                    "docid": docids[order].astype(np.int64),
                    "score": s[order],
                }
            )

    return (
        cand.mapInPandas(score_stream, "docid long, score float")
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(want)
    )


def _single_term_stream_topk(cand: DataFrame, weight, tf_cache,
                             bucket_shift: int, want: int):
    """Collected form of :func:`_single_term_stream_plan` —
    [(docid, f32 score)] in the pinned total order."""
    rows = _single_term_stream_plan(
        cand, weight, tf_cache, bucket_shift, want
    ).collect()
    return [(int(r["docid"]), np.float32(r["score"])) for r in rows]


def _block_prefilter(blocks_df: DataFrame, theta: float, weights: dict,
                     avgdls: dict, mult: dict) -> DataFrame:
    """JVM-visible per-row block-θ prefilter, applied BEFORE the bucket
    shuffle so skipped blocks never cross the exchange or reach Python.

    A block of scored group g = (field, term) is droppable when
    ``mult_g·bound(block) + Σ_{g'≠g} mult_{g'}·weight_{g'} < θ``: every
    doc it covers stays below θ even if every OTHER clause contributes
    its absolute cap (``block_max_score ≤ weight`` since f/(f+norm)<1).
    The predicate depends only on (max_tf_code, min_fieldnorm_id), so it
    compiles to a broadcast lookup: per group a 256-row
    ``min_fieldnorm_id -> minimal admissible max_tf_code`` table,
    joined and filtered entirely JVM-side (whole-stage codegen, no UDF).
    Unscored rows (must_not terms) pass through.  Any block this filter
    drops, the in-kernel interval mask would also drop under the same
    tiling (its interval-sum bound is ≤ the absolute-cap bound used
    here) — but removing a block SHIFTS the mask's tiling for its
    neighbors, so decode-count receipts must replay the mask over the
    post-prefilter rows, not the full set (see PruningReceipt)."""
    spark = blocks_df.sparkSession
    n_contrib = sum(mult.get(t, 0) for (_f, t) in weights)
    total_cap = sum(
        mult.get(t, 0) * float(w) for (f, t), w in weights.items()
    )
    infl = 1.0 + _F32_EPS * max(n_contrib, 1)
    codes = np.repeat(np.arange(256, dtype=np.int64), 256)
    mfns = np.tile(np.arange(256, dtype=np.int64), 256)
    rows = []
    for (f, t), w in weights.items():
        mm = mult.get(t, 0)
        if not mm:
            continue
        cap_other = total_cap - mm * float(w)
        b = block_max_score(codes, mfns, avgdls[f], w).astype(np.float64)
        ok = ((mm * b + cap_other) * infl >= theta).reshape(256, 256)
        any_ok = ok.any(axis=0)
        first = np.argmax(ok, axis=0)  # codes are bound-monotone; even
        # if not, >= first keeps a SUPERSET of admissible codes (safe)
        mtc_min = np.where(any_ok, first, 256)
        rows.extend(
            (f, t, int(m), int(c)) for m, c in enumerate(mtc_min)
        )
    if not rows:
        return blocks_df
    lut = spark.createDataFrame(
        rows, "field string, term string, min_fieldnorm_id int, mtc_min int"
    )
    out = blocks_df.join(
        F.broadcast(lut), ["field", "term", "min_fieldnorm_id"], "left"
    )
    return out.filter(
        F.col("mtc_min").isNull() | (F.col("max_tf_code") >= F.col("mtc_min"))
    ).drop("mtc_min")


def _wand_fields(index) -> tuple[dict, "ServingIndex"]:
    """field name -> ServingIndex; single-field indexes expose their one
    field as ``content`` (the engine schema's default)."""
    if hasattr(index, "fields"):
        return dict(index.fields), index.primary
    return {"content": index}, index


def _prepare(index, spec: QuerySpec, term_fields: dict | None = None):
    """Driver-side: broadcast-able term stats -> per-(field, term)
    weights, per-field tf caches/avgdls, the union candidate block scan
    (each field's blocks tagged with its name), and the per-field stats.

    ``term_fields``: term -> ordered tuple of (field name, f32 field
    boost); defaults to ``content`` with boost 1 (the flat QuerySpec
    surface).  Returns None when a Must term is absent from every one of
    its fields (no document can match)."""
    fidx, primary = _wand_fields(index)
    uniq: list[str] = []
    for t in spec.clause_terms() + list(spec.must_not):
        if t not in uniq:
            uniq.append(t)
    if not uniq:
        return None
    if term_fields is None:
        term_fields = {t: (("content", 1.0),) for t in uniq}
    doc_count, _tt = primary.stats()
    field_names: list[str] = []
    for t in uniq:
        for fname, _fb in term_fields.get(t, ()):
            if fname in fidx and fname not in field_names:
                field_names.append(fname)
    if not field_names:
        return None
    stats = {f: fidx[f].df_of_terms(uniq) for f in field_names}
    tf_order = {}  # term -> ordered field names actually queryable
    for t in uniq:
        tf_order[t] = tuple(
            fname for fname, _fb in term_fields.get(t, ()) if fname in fidx
        )
    for t in spec.must:
        if not any(stats[f].get(t) for f in tf_order.get(t, ())):
            return None
    avgdls: dict = {}
    tf_caches: dict = {}
    for f in field_names:
        _n, total_tokens = fidx[f].stats()
        avgdls[f] = compute_avgdl(total_tokens, doc_count)
        tf_caches[f] = compute_tf_cache(avgdls[f])
    weights = {}
    for t in uniq:
        if t in spec.must_not:
            continue
        for fname, fboost in term_fields.get(t, ()):
            if fname not in fidx:
                continue
            df = stats[fname].get(t)
            if not df:
                continue
            # exact kernel weight op order: term_weight(df, N,
            # f32(clause boost) * f32(field boost))
            weights[(fname, t)] = np.float32(
                term_weight(
                    df, doc_count,
                    np.float32(np.float32(spec.boost_of(t))
                               * np.float32(fboost)),
                )
            )
    cand = None
    for f in field_names:
        present = [t for t in uniq if stats[f].get(t) and f in tf_order[t]]
        if not present:
            continue
        sub = fidx[f]
        tparts = sorted(
            {term_partition(t, sub.n_term_partitions) for t in present}
        )
        part = sub.blocks.filter(
            F.col("tpart").isin(tparts) & F.col("term").isin(present)
        )
        # WAND never touches positions: prune pos_bytes (the HEAVIEST
        # block column) so the parquet scan skips its pages and the
        # bucket exchange never ships it
        keep = [
            c for c in (
                "term", "bucket", "first_doc", "n", "doc_bytes",
                "tf_bytes", "norm_bytes", "max_tf_code",
                "min_fieldnorm_id", "codec",
            ) if c in part.columns
        ]
        part = part.select(*keep).withColumn("field", F.lit(f))
        cand = part if cand is None else cand.unionByName(part)
    if cand is None:
        return None
    return weights, tf_caches, avgdls, cand, stats, tf_order


@dataclass
class PruningReceipt:
    """Proof the pruned path ran and how much it skipped (the reference's
    pruning-conformance receipts, index.rs:2434-2560, reduced to counts).

    ``buckets_unmatchable`` counts candidate buckets dropped by the
    bucket-granular required-clause rule (a Must term absent from every
    queried field) — they never reach the bound ranking at all."""

    buckets_total: int = 0
    buckets_scored: int = 0
    buckets_unmatchable: int = 0
    theta: float = float("-inf")
    # BLOCK-granular receipt (argus.rs:4474-4520 granularity), measured
    # over the post-θ survivor buckets.  blocks_total counts every block
    # row in those buckets; blocks_after_prefilter counts rows that
    # crossed the exchange after the JVM broadcast-LUT prefilter; and
    # blocks_decoded replays the kernel's interval mask over EXACTLY the
    # post-prefilter rows the bucket tasks received (the mask's tiling
    # depends on which rows are present, so replaying over the full set
    # would under-count decodes — caught in round-3 review).
    blocks_total: int = 0
    blocks_after_prefilter: int = 0
    blocks_decoded: int = 0
    # term-level MaxScore receipt (argus.rs:4463-4485): scored clause
    # terms vs the count eliminated as candidate GENERATORS (their
    # blocks decode only where an essential-list candidate exists)
    terms_scored: int = 0
    terms_nonessential: int = 0

    @property
    def buckets_skipped(self) -> int:
        return self.buckets_total - self.buckets_scored

    @property
    def blocks_skipped(self) -> int:
        return self.blocks_total - self.blocks_decoded


WAND_MIN_COST = 16_384  # argus.rs:31 — prune only past this posting volume
# Driver-local serving lane: when the query's exact posting volume
# (Σ df over scored (field, term) pairs — known from preloaded stats)
# fits under this cap, the candidate block rows collect in ONE action
# (≤ ~3 MB compressed) and the same bucket kernel runs in-process —
# measured 2M i.i.d.: the bucket exchange + Python-worker stage cost
# more wall-clock than the whole kernel for such shapes.  Above the cap
# the distributed path runs unchanged; driver memory is bounded by the
# cap, never the corpus.
LOCAL_LANE_MAX_POSTINGS = 1_000_000
# The local lane is a LATENCY optimization for an idle server: its
# driver-side pandas groupby/concat holds the GIL, so N concurrent
# local-lane queries serialize (~1.45x overlap at 8 threads, measured
# sf0.1 r5) while the distributed path overlaps ~2.9x through Spark's
# FAIR scheduler.  Cap in-flight local-lane queries — excess concurrent
# queries spill to the distributed path, where executor capacity is
# idle exactly when the driver is the bottleneck.  Both lanes are
# bit-identical (pinned), so the route is purely a performance choice.
LOCAL_LANE_MAX_INFLIGHT = 2
_local_lane_slots = threading.BoundedSemaphore(LOCAL_LANE_MAX_INFLIGHT)
COVERAGE_GAP_MIN = 0.05  # prune only if ≥5% of buckets lack some clause term
# Block-granular θ-pruning engages only when the estimated skippable
# block fraction clears this: the θ ceremony costs ~2 extra jobs, and
# skipping b% of blocks saves ~b% of ONE decode job — measured on the
# 2M i.i.d. index, a real mega-term θ skips just 6% of blocks (θ lands
# within ~10% of the max block bound for small k), where the single
# exhaustive job is 2.5x faster than the ceremony.  Clustered/skewed
# corpora clear this easily (bimodal doc lengths → ~50%).
BLOCK_PRUNE_MIN_FRAC = 0.3
SHAPE_LOW_C = 0.85  # "skippable" proxy: bound < 0.85 × group max bound
# Quantile grid for the shape-flatness estimate.  _frac_low
# floor-quantizes the true low-shape fraction to the largest grid point
# it exceeds, so the grid must RESOLVE the BLOCK_PRUNE_MIN_FRAC=0.3
# decision boundary: points at 0.2/0.3/0.4 do that.  (A coarser
# 0.1/0.25/0.5 grid reported 0.25 for a bimodal doc-length corpus whose
# true skippable fraction was 0.47 — under the gate — and wrongly routed
# it to the exhaustive pass.)
SHAPE_QUANTILE_GRID = (0.1, 0.2, 0.3, 0.4, 0.5, 0.75, 0.9)
SHAPE_QUANTILE_SQL = (
    "percentile_approx(shape, array("
    + ", ".join(str(p) for p in SHAPE_QUANTILE_GRID)
    + "))"
)


def _frac_low(qs, mx) -> float:
    """Largest sampled quantile of a group's per-block bound shape that
    sits below ``SHAPE_LOW_C × max`` — a θ-free estimate of the
    block-skippable volume (θ for small k lands near the max bound)."""
    if not mx:
        return 0.0
    frac = 0.0
    for p, v in zip(SHAPE_QUANTILE_GRID, qs or ()):
        if v is not None and float(v) < SHAPE_LOW_C * float(mx):
            frac = p
    return frac


def _coverage_gap(fidx: dict, spec: QuerySpec, tf_order: dict,
                  stats: dict | None = None) -> float | None:
    """Largest prunability signal over the scored clause terms, from the
    preloaded per-term planning stats — or None when any queried field
    hasn't preloaded them (gate inactive).

    Per (term, field) the signal is ``max(coverage gap, block-skippable
    fraction)``: skipping a bucket needs some clause term to be absent
    there (Must rule / missing contribution), and skipping a BLOCK needs
    its bound below θ — estimated by the fraction of the term's blocks
    whose bound shape sits under ``SHAPE_LOW_C × max`` (only actionable
    past ``BLOCK_PRUNE_MIN_FRAC``: below that the θ ceremony's extra
    jobs cost more than the skipped decode, measured on the 2M i.i.d.
    index).  A query whose every term covers every bucket with
    near-identical per-block shape has provably near-uniform bounds,
    and the θ ceremony can only add jobs.

    The block-shape signal counts only for SINGLE-scored-term queries
    (round 4): with S scored clauses, θ is the k-th best SUM of
    contributions, so a block of term t skips only when
    ``w_t·shape_t < θ − Σ_{u≠t} max contribution_u`` — a cut that sits
    just under t's own maximum, not under ``SHAPE_LOW_C × max`` the
    per-term quantile signal tests.  The receipts bore this out on the
    2M i.i.d. index: natural/natural5/must queries skipped **0.0%** of
    blocks while the undiluted shape signal green-lit the ceremony
    (~3.2 s of bound/seed/θ jobs for nothing — natural5 6.9 s pruned
    vs 3.6 s exhaustive).  Multi-term prunability on clustered corpora
    flows through the coverage-gap signal instead (terms concentrated
    in docid ranges leave whole buckets absent), which this gate keeps
    for every clause count — the clustered 87–97% prune measurements
    all show large coverage gaps.

    ``stats`` (per-field term → df, already computed by ``_prepare``)
    disambiguates a coverage-cache MISS when the bounded preload
    truncated: with df > 0 the term EXISTS but was evicted for low
    coverage, so (a) it still counts toward the multi-term dilution of
    the block-shape signal, and (b) its coverage is provably ≤ the
    smallest cached entry (the cache keeps the top-max_terms BY
    coverage), which contributes a sound coverage-gap lower bound —
    without this, a huge-vocabulary index would misread evicted rare
    terms as absent and re-enable the round-4 undiluted-signal
    misroute this gate exists to prevent."""
    worst = 0.0
    any_seen = False

    def _scored(t):
        if stats is not None:
            return any(stats.get(f, {}).get(t) for f in tf_order.get(t, ()))
        return any(
            (getattr(fidx.get(f), "_bucket_cov", None) or {}).get(t)
            for f in tf_order.get(t, ())
        )

    contributing = [
        t for t in dict.fromkeys(spec.clause_terms()) if _scored(t)
    ]
    single_scored = len(contributing) <= 1
    for t in dict.fromkeys(spec.clause_terms()):
        for f in tf_order.get(t, ()):
            sub = fidx.get(f)
            cov = getattr(sub, "_bucket_cov", None)
            total = getattr(sub, "_total_buckets", None)
            if cov is None or not total:
                return None
            ent = cov.get(t)
            if ent is None:
                df = (stats or {}).get(f, {}).get(t, 0)
                if getattr(sub, "_bucket_cov_complete", True) or not df:
                    continue  # term absent from the field: no bound
                # evicted tail term: nb ≤ min(smallest kept nb, df)
                min_nb = getattr(sub, "_bucket_cov_min_nb", None)
                if min_nb is None:
                    continue
                nb_ub = min(min_nb, df, total)
                any_seen = True
                worst = max(worst, 1.0 - nb_ub / total)
                continue
            nb, frac = ent[0], ent[1]
            any_seen = True
            block_sig = (
                frac
                if (single_scored and frac >= BLOCK_PRUNE_MIN_FRAC)
                else 0.0
            )
            worst = max(worst, 1.0 - nb / total, block_sig)
    return worst if any_seen else None


def _must_term_nb_ub(fidx: dict, t: str, tf_order: dict,
                     stats: dict) -> int | None:
    """Summed per-field UPPER BOUND on the buckets that can contain
    Must term ``t``, or None when a queried field lacks the preloaded
    planning stats.  A coverage-cache miss under a TRUNCATED preload is
    still bounded: eviction keeps the top-max_terms by coverage, so the
    missing term's per-field bucket count is ≤ min(smallest kept nb,
    df) — rare Must terms (the ones the pre-restriction helps most) are
    exactly the entries a bounded cache evicts first, and without this
    fallback the gate would silently go dead at web-scale vocabulary."""
    nb = 0
    seen = False
    for f in tf_order.get(t, ()):
        sub = fidx.get(f)
        cov = getattr(sub, "_bucket_cov", None)
        tot = getattr(sub, "_total_buckets", None)
        if cov is None or not tot:
            return None
        ent = cov.get(t)
        if ent:
            nb += ent[0]
            seen = True
            continue
        df = stats.get(f, {}).get(t, 0)
        if getattr(sub, "_bucket_cov_complete", True) or not df:
            continue  # truly absent from this field
        min_nb = getattr(sub, "_bucket_cov_min_nb", None)
        if min_nb is None:
            return None
        nb += min(min_nb, df, tot)
        seen = True
    return nb if seen else None


def _must_coverage_frac(fidx: dict, spec: QuerySpec, tf_order: dict,
                        stats: dict) -> tuple[float, str, int] | None:
    """(worst coverage fraction, its Must term, that term's bucket-count
    upper bound) over the Must clauses, from the PRELOADED planning
    stats (long-lived serving only) — or None when unknown.

    Soundness: a matching doc contains every Must term, so only buckets
    where that term appears (in ANY of its queried fields) can hold
    matches — summing per-field bucket counts over-estimates coverage
    (shared buckets count twice), which only makes the gate MORE
    conservative about applying the restriction."""
    worst: tuple[float, str, int] | None = None
    for t in spec.must:
        nb = _must_term_nb_ub(fidx, t, tf_order, stats)
        if nb is None:
            return None
        total = 0
        for f in tf_order.get(t, ()):
            total = max(
                total, getattr(fidx.get(f), "_total_buckets", None) or 0
            )
        if not total:
            return None
        frac = min(1.0, nb / total)
        if worst is None or frac < worst[0]:
            worst = (frac, t, nb)
    return worst


# Spark-economics serving gates (round 5, measured on the 2M clustered
# corpora): one Spark job costs ~0.5 s of fixed constants at any data
# volume, so the bound/seed/θ ceremony (2-3 extra sequential jobs) only
# pays when the decode it avoids is tens of millions of postings.  The
# reference's WAND_MIN_COST=16k reflects in-process per-posting
# economics (argus.rs:31) and stays as the lower bound; these two gates
# encode the cluster-side job-constant economics on top:
# - a query whose whole posting volume fits the driver-local lane
#   (≤1M) answers fastest as ONE exhaustive/local job (measured:
#   should_repolocal θ-pruned 1.28-1.39 s vs exhaustive 0.59-0.73 s
#   even with θ skipping 98% of buckets);
# - a Must term covering ≤ this fraction of buckets already restricts
#   the candidate scan to that fraction (the semi-join below), so the
#   one restricted exhaustive job beats the ceremony regardless of
#   total volume (measured: must_repolocal gated 2.5 s -> ~1.0 s).
MUST_EXHAUSTIVE_MAX_FRAC = 0.10
# apply the must-bucket semi-join whenever coverage is known and below
# this (above it the join filters little and just adds a stage)
MUST_RESTRICT_MAX_FRAC = 0.5
# force-broadcast the restriction bucket set only when its size is
# BOUNDED IN ROWS (≈16 MB of longs), not merely in fraction — a 30-50%
# coverage fraction of a web-scale bucket space is still millions of
# rows, and an explicit broadcast hint would collect all of them on
# the driver per query; above the cap the semi-join runs unhinted
# (Catalyst/AQE picks shuffle vs broadcast from measured sizes)
MUST_BROADCAST_MAX_BUCKETS = 2_000_000


def wand_topk(
    index,
    spec: QuerySpec,
    k: int = 10,
    offset: int = 0,
    prune: bool = True,
    seed_buckets: int = 4,
    seed_scan_cap: int = 64,
    receipt: PruningReceipt | None = None,
    min_cost: int = WAND_MIN_COST,
    term_fields: dict | None = None,
) -> list[tuple[int, np.float32]]:
    """Top-k under the pinned total order via bucket-granular block-max WAND.

    ``index`` may be a single-field ServingIndex or a ServingMultiIndex
    (``term_fields`` then maps each term to its ordered (field, boost)
    scopes — see :func:`serving_exec.ast_to_queryspec_fields`).
    ``prune=False`` scores every candidate bucket (exhaustive-over-blocks);
    the pruned path is rank-identical by the conservative-bound theorem.
    Plan shape (no driver-side materialization beyond O(seed + k) rows):

      bounds   = cand.groupBy(bucket, field, term).agg(...)
                     .groupBy(bucket).applyInPandas(bound)     # distributed
      seeds    = bounds TakeOrderedAndProject(seed_scan_cap)   # tiny collect
      θ        = kth of kernel(seed buckets) top-k             # k-row collect
      winners  = kernel(buckets with bound ≥ θ) top-k          # k-row collect
    """
    prep = _prepare(index, spec, term_fields)
    if prep is None:
        return []
    weights, tf_caches, avgdls, cand, stats, tf_order = prep
    fidx, primary = _wand_fields(index)
    shift = primary.bucket_shift
    want = offset + k
    # the reference's cost gate (argus.rs:30-31): below WAND_MIN_COST
    # postings, bound/seed/θ orchestration costs more than one
    # exhaustive decode pass — run that single job instead.  Pruning also
    # needs enough BUCKETS that skipping some is worth the extra jobs:
    # below ~4x the seed set, the seed pass already touches most of the
    # corpus (bucket count ≈ doc_count / 2^shift, no job needed).
    # (min_cost=0 forces the pruned path — the tests' conformance mode)
    query_cost = sum(
        stats[f].get(t, 0)
        for t in dict.fromkeys(spec.clause_terms())
        for f in tf_order.get(t, ())
    )
    # what one exhaustive/local pass actually TOUCHES: the candidate
    # scan also carries every MustNot term's blocks (exclusions must
    # see all candidates), so volume-based routing decisions must
    # count them — query_cost alone would let `rare -mega` shapes
    # collect a mega term's whole block payload onto the driver
    collect_cost = query_cost + sum(
        stats[f].get(t, 0)
        for t in dict.fromkeys(spec.must_not)
        for f in tf_order.get(t, ())
    )
    est_buckets = max(1, primary.stats()[0] >> shift)
    if min_cost > 0 and (
        query_cost < min_cost or est_buckets < 4 * seed_buckets
    ):
        prune = False
    # bucket-granular required-clause PRE-restriction (round 5): when
    # preloaded coverage shows the rarest Must term lives in few
    # buckets, semi-join the whole candidate scan down to its buckets
    # before ANY path runs — a semantics-preserving plan shrink (docs
    # outside those buckets cannot match) that makes the exhaustive
    # path as cheap as the Must rule allows.  Tiny distinct on the
    # term's own block rows; broadcast-sized at any corpus scale.
    must_info = (
        _must_coverage_frac(fidx, spec, tf_order, stats)
        if spec.must
        else None
    )
    must_frac = must_info[0] if must_info is not None else None
    if must_frac is not None and must_frac <= MUST_RESTRICT_MAX_FRAC:
        _f, rarest, rarest_nb = must_info
        mb = cand.filter(F.col("term") == rarest).select("bucket").distinct()
        if receipt is not None:
            # the restriction IS the required-clause rule applied at
            # plan time — account the dropped buckets where that rule
            # already reports (receipt runs are untimed, extra counting
            # jobs are fine there)
            pre = cand.select("bucket").distinct().count()
            post = mb.count()
            receipt.buckets_unmatchable += max(0, pre - post)
        if rarest_nb <= MUST_BROADCAST_MAX_BUCKETS:
            mb = F.broadcast(mb)
        cand = cand.join(mb, "bucket", "left_semi")
    if min_cost >= WAND_MIN_COST and prune and (
        collect_cost <= LOCAL_LANE_MAX_POSTINGS
        or (must_frac is not None and must_frac <= MUST_EXHAUSTIVE_MAX_FRAC)
    ):
        # Spark job-constant economics (see the gate constants above):
        # the θ ceremony's extra jobs cannot beat one bounded decode.
        # Active only at the DEFAULT cost floor: a reduced min_cost is
        # the conformance/test knob for exercising the θ machinery on
        # small fixtures.
        prune = False
    if min_cost > 0 and prune:
        # coverage gate (active only in long-lived serving mode, after
        # preload_bucket_coverage): when every clause term is present in
        # ~every bucket, bounds are near-uniform and the bound/seed/θ
        # jobs cannot skip anything — answer with the one exhaustive
        # decode job instead
        gap = _coverage_gap(fidx, spec, tf_order, stats)
        if gap is not None and gap < COVERAGE_GAP_MIN:
            prune = False
    out_schema = "docid long, score float"
    tomb = index.tombstones

    def run_topk(blocks_df, theta: float = -math.inf,
                 non_essential: set | None = None) -> list[tuple[int, np.float32]]:
        score_one, score_cog = _score_buckets_kernel(
            spec, weights, tf_caches, want, shift, tf_order,
            theta=theta, avgdls=avgdls, non_essential=non_essential,
        )
        if (
            tomb is None
            and collect_cost <= LOCAL_LANE_MAX_POSTINGS
            and _local_lane_slots.acquire(blocking=False)
        ):
            # DRIVER-LOCAL lane for bounded posting volume (the exact
            # sum of the clause AND MustNot terms' df — everything the
            # candidate scan carries — known from preloaded stats):
            # ONE collect of the still-compressed candidate block rows
            # (≤ ~3 MB at the cap) + the same per-bucket kernel
            # in-process — no bucket exchange, no Python-worker stage.
            # This is the reference's in-process serving shape
            # (argus.rs runs the whole cursor tree in one thread) and
            # the same driver-local twin discipline as hybrid fusion
            # (engine.py r4).  Bit parity is structural: score_one is
            # byte-for-byte the distributed kernel, per bucket, and the
            # final total-order merge equals orderBy(desc score, asc
            # docid).limit(want).  Mega shapes (query_cost above the
            # cap) keep the distributed path — at 100 TB the cap, not
            # the corpus, bounds driver memory.  Concurrency past
            # LOCAL_LANE_MAX_INFLIGHT spills to the distributed path
            # below (the non-blocking slot acquire failed).
            try:
                pdf_all = blocks_df.toPandas()
                if len(pdf_all) == 0:
                    return []
                outs = [
                    out
                    for _b, g in pdf_all.groupby("bucket", sort=False)
                    if len(out := score_one(g))
                ]
                if not outs:
                    return []
                merged = pd.concat(outs, ignore_index=True)
                sc = merged["score"].to_numpy(dtype=np.float32)
                dc = merged["docid"].to_numpy(dtype=np.int64)
                order = score_total_order_key(sc, dc)[:want]
                return [(int(dc[i]), np.float32(sc[i])) for i in order]
            finally:
                _local_lane_slots.release()
        if tomb is None:
            scored = blocks_df.groupBy("bucket").applyInPandas(
                score_one, out_schema
            )
        else:
            tb = tomb.select(
                F.col("docid").cast("long").alias("docid")
            ).withColumn("bucket", F.shiftright(F.col("docid"), shift))
            scored = (
                blocks_df.groupBy("bucket")
                .cogroup(tb.groupBy("bucket"))
                .applyInPandas(score_cog, out_schema)
            )
        rows = (
            scored.orderBy(F.desc("score"), F.asc("docid"))
            .limit(want)
            .collect()
        )
        return [(int(r["docid"]), np.float32(r["score"])) for r in rows]

    scored_terms = [
        t for t in spec.clause_terms()
        if any((f, t) in weights for f in tf_order.get(t, ()))
    ]
    if not prune or not scored_terms:
        if (
            tomb is None
            and len(weights) == 1
            and not spec.must_not
            and len(spec.clause_terms()) == 1
        ):
            # (an unscored Must term can't slip through: with ONE clause
            # term and ONE weight entry, that term IS the scored clause —
            # a missing-from-corpus Must term would leave weights empty
            # and fail the len check; '+foo foo' multiplicity shapes fail
            # the clause_terms()==1 check)
            # SHUFFLE-FREE single-term fast path: with one scored
            # (field, term) clause every doc owns exactly one posting,
            # so no cross-block accumulation exists — score each block
            # where it lies (mapInPandas, no bucket exchange), keep a
            # partition-local top-k, and let TakeOrderedAndProject
            # merge.  This is the mega-term/short-keyword class the
            # coverage gate routes exhaustive on i.i.d. corpora; the
            # bucket groupBy there only paid for an accumulation that
            # cannot happen.  Bit-exact: the kernel's single-clause
            # score IS w·tf/(tf+norm) with no additions.
            (fname, t), w = next(iter(weights.items()))
            winners = _single_term_stream_topk(
                cand, w, tf_caches[fname], shift, want
            )
        else:
            winners = run_topk(cand)
    else:
        # Phase A: distributed per-bucket conservative bounds
        meta = cand.groupBy("bucket", "field", "term").agg(
            F.max("max_tf_code").alias("mtc"),
            F.min("min_fieldnorm_id").alias("mfn"),
            F.sum("n").alias("n_postings"),
        )
        bounds = _jvm_bucket_bounds(
            meta, set(spec.must), weights, avgdls, _clause_mult(spec)
        ).persist()
        # Dispersion gate: θ can only clear a bucket whose bound sits
        # BELOW the best achievable score, so when the bound distribution
        # is near-flat (i.i.d. corpora: every bucket holds near-identical
        # term statistics) the θ ceremony would score every bucket anyway
        # through two extra jobs.  One cheap metadata agg detects that;
        # the bypass still keeps the required-clause bucket filter (the
        # semi-join on bounds) and is rank-identical by construction.
        # min_cost=0 (the tests' conformance force mode) always takes
        # the full θ machinery.
        flat_bounds = False
        if min_cost > 0:
            disp = bounds.agg(
                F.max("bound").alias("mx"),
                F.expr("percentile_approx(bound, 0.25)").alias("q25"),
            ).collect()[0]
            flat_bounds = (
                disp["mx"] is not None
                and disp["q25"] is not None
                and disp["q25"] >= 0.98 * disp["mx"]
            )
        if flat_bounds:
            # flat BUCKET bounds no longer end the story: the
            # 128-posting BLOCKS inside those buckets may still vary
            # (block-max WAND's native granularity — a df≈N term on an
            # i.i.d. corpus is exactly this shape).  One metadata-only
            # agg estimates the block-skippable fraction per scored
            # group; the θ machinery re-engages only when it clears
            # BLOCK_PRUNE_MIN_FRAC (mere variation isn't enough — the
            # 2M i.i.d. receipts show θ skipping just 6% of a
            # mega-term's blocks, where exhaustive is 2.5x faster).
            scored_rows = cand
            if spec.must_not:
                scored_rows = cand.filter(
                    ~F.col("term").isin(list(spec.must_not))
                )

            def gshape(pdfs):
                for pdf in pdfs:
                    if len(pdf) == 0:
                        continue
                    out = []
                    for f in pdf["field"].unique():
                        sub = pdf[pdf["field"] == f]
                        s = block_max_score(
                            sub["max_tf_code"].to_numpy(np.int64),
                            sub["min_fieldnorm_id"].to_numpy(np.int64),
                            avgdls[f],
                            np.float32(1.0),
                        )
                        out.append(pd.DataFrame({
                            "field": sub["field"], "term": sub["term"],
                            "shape": s.astype(np.float64),
                        }))
                    yield pd.concat(out)

            grows = (
                scored_rows.select(
                    "field", "term", "max_tf_code", "min_fieldnorm_id"
                )
                .mapInPandas(gshape, "field string, term string, shape double")
                .groupBy("field", "term")
                .agg(
                    F.max("shape").alias("mx"),
                    F.expr(SHAPE_QUANTILE_SQL).alias("qs"),
                )
                .collect()
            )
            if any(
                _frac_low(r["qs"], r["mx"]) >= BLOCK_PRUNE_MIN_FRAC
                for r in grows
            ):
                flat_bounds = False
        if flat_bounds:
            winners = run_topk(
                cand.join(bounds.select("bucket"), "bucket", "left_semi")
            )
            if receipt is not None:
                receipt.buckets_total = bounds.count()
                receipt.buckets_scored = receipt.buckets_total
                receipt.buckets_unmatchable += (
                    cand.select("bucket").distinct().count()
                    - receipt.buckets_total
                )
            bounds.unpersist()
        else:
            # Phase A': certify θ by scoring the best-bounded buckets
            # exactly.  Only the seed CANDIDATES are collected
            # (≤ seed_scan_cap rows); the greedy postings-volume rule
            # runs over that tiny list.
            seed_rows = (
                bounds.orderBy(F.desc("bound"), F.asc("bucket"))
                .limit(seed_scan_cap)
                .collect()
            )
            seed: list[int] = []
            acc_n = 0
            for r in seed_rows:
                seed.append(int(r["bucket"]))
                acc_n += int(r["n_postings"])
                if len(seed) >= seed_buckets and acc_n >= 4 * want:
                    break
            winners = run_topk(cand.filter(F.col("bucket").isin(seed)))
            if len(winners) >= want:
                order = score_total_order_key(
                    np.array([s for _, s in winners], np.float32),
                    np.array([d for d, _ in winners], np.int64),
                )
                theta = float(np.float32(winners[order[want - 1]][1]))
            else:
                theta = -math.inf
            survivors = bounds.filter(
                (F.col("bound") >= theta) & ~F.col("bucket").isin(seed)
            ).select("bucket")
            rest = cand.join(survivors, "bucket", "left_semi")
            mult_map = _clause_mult(spec)
            pruned_rest = rest
            ne_terms: set = set()
            if theta != -math.inf:
                pruned_rest = _block_prefilter(
                    rest, theta, weights, avgdls, mult_map
                )
                ne_terms = _maxscore_split(
                    spec, weights, tf_order, fidx, theta
                )
            winners += run_topk(
                pruned_rest, theta=theta, non_essential=ne_terms
            )
            if receipt is not None:
                # extra counting jobs — only on request (receipts)
                receipt.buckets_total = bounds.count()
                receipt.buckets_scored = len(seed) + survivors.count()
                receipt.buckets_unmatchable += (
                    cand.select("bucket").distinct().count()
                    - receipt.buckets_total
                )
                receipt.theta = theta
                # count SCORED terms (some field weight exists) — the
                # population _maxscore_split's 2..=8 gate and
                # elimination actually operate on; an absent-from-
                # corpus clause term would otherwise inflate the count
                receipt.terms_scored = len(
                    {
                        t
                        for t in dict.fromkeys(spec.clause_terms())
                        if any(
                            weights.get((f, t)) is not None
                            for f in tf_order.get(t, ())
                        )
                    }
                )
                receipt.terms_nonessential = len(ne_terms)
                if theta != -math.inf:
                    # block-granular receipt: metadata-only replay of
                    # the kernel's interval mask over EXACTLY the rows
                    # the bucket tasks received (pruned_rest, i.e. after
                    # the JVM prefilter).  Replaying over the full rest
                    # would tile the intervals differently — a kept
                    # block's tile could end earlier and miss mass the
                    # kernel's coarser tiling credited it — so the full
                    # replay is NOT the decode count (round-3 review).
                    def count_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
                        keepm = _block_keep_mask(
                            pdf, theta, weights, avgdls, mult_map, shift,
                        )
                        return pd.DataFrame(
                            {"t": [len(pdf)], "k": [int(keepm.sum())]}
                        )

                    receipt.blocks_total = rest.count()
                    crow = (
                        pruned_rest.select(
                            "bucket", "field", "term", "first_doc",
                            "max_tf_code", "min_fieldnorm_id",
                        )
                        .groupBy("bucket")
                        .applyInPandas(count_blocks, "t long, k long")
                        .agg(F.sum("t").alias("t"), F.sum("k").alias("k"))
                        .collect()[0]
                    )
                    receipt.blocks_after_prefilter = int(crow["t"] or 0)
                    receipt.blocks_decoded = int(crow["k"] or 0)
            bounds.unpersist()

    if not winners:
        return []
    scores = np.array([s for _, s in winners], dtype=np.float32)
    docids = np.array([d for d, _ in winners], dtype=np.int64)
    order = score_total_order_key(scores, docids)[offset : offset + k]
    return [(int(docids[i]), np.float32(scores[i])) for i in order]


def wand_bits(index: ServingIndex, query, k: int = 10, **kw):
    spec = query if isinstance(query, QuerySpec) else QuerySpec.from_text(query)
    return [
        (d, int(np.float32(s).view(np.uint32)))
        for d, s in wand_topk(index, spec, k, **kw)
    ]
