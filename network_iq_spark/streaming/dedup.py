"""Streaming dedup — the Structured Streaming sibling of the batch dedup
tier (operators/dedup.py exact_dedup / windows.py dedup-keep-last).

Two shapes, both state-bounded by a watermark (the property that keeps a
100 TB/day stream's dedup state finite):

- **Exact arrival dedup** (``streaming_exact_dedup``):
  ``dropDuplicatesWithinWatermark`` keeps the FIRST arrival per key and
  drops any duplicate that arrives within the watermark delay of it. This
  is the ingestion-time contract a training-data firehose needs (at-least-
  once upstream delivery → exactly-once content downstream); duplicates
  separated by more than the watermark are the batch tier's job (the
  nightly exact_dedup pass over the at-rest table), which is the standard
  lambda split for dedup state that cannot live in memory forever.

- **Keep-last snapshot** (``kpis.latest_per_key``): update-mode stateful
  op already in the tier (W6/P12 analogue).

The fingerprint column uses the SAME md5 normalization as the batch
``text.fingerprint`` operator, so a row deduped in-stream hashes identically
to one deduped at rest — stream and batch agree on what "duplicate" means.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "fingerprint"
) -> DataFrame:
    """md5 over whitespace-normalized lowercase text — identical to the
    batch ``operators.text.fingerprint`` key, usable on a stream (pure
    map, no state)."""
    from network_iq_spark.operators.text import WS_RE

    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), WS_RE, " ")
    return df.withColumn(out, F.md5(norm))


def streaming_exact_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    event_time_col: str,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """First-arrival-wins exact dedup over a stream.

    ``dropDuplicatesWithinWatermark`` stores one state row per key seen
    within the watermark horizon and emits only the first arrival; state
    for a key is evicted once the watermark passes its event time, so
    memory is O(keys per watermark window), not O(stream history).
    """
    return stream.withWatermark(
        event_time_col, watermark_delay
    ).dropDuplicatesWithinWatermark(list(keys))


def read_if_exists(spark, path: str) -> DataFrame | None:
    """Read a parquet path, or None if it does not exist yet.

    Distinguishes "not written yet" (first batch — legitimate None) from
    a genuine read failure: a transient storage/permission error
    swallowed here would silently disable the stage that needed the data
    (e.g. admit duplicates permanently in the near-dup sink), so only
    path-absence maps to None. Existence is probed through the Hadoop
    FileSystem API (the sink.py idiom — correct on hdfs:// and s3a://
    where a driver-local os.path check is not); read errors on an
    EXISTING path propagate, failing the micro-batch so the engine
    retries it.
    """
    p = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not bool(fs.exists(p)):
        return None
    return spark.read.parquet(path)


def write_batch_partition(df: DataFrame, path: str, batch_id: int) -> None:
    """Exactly-once micro-batch append: write DIRECTLY to the
    ``batch=<id>`` partition directory with overwrite, so a replayed
    batch truncates-and-rewrites its own partition (the streaming/sink.py
    discipline, without a key-merge). The direct-path form (vs dynamic
    partition overwrite of the root) matters in one replay corner: a
    replay whose recomputed frame is EMPTY still rewrites the directory —
    dynamic overwrite of an empty frame touches no partitions and would
    leave the original rows standing. The ``batch`` column comes back at
    read time from partition discovery over the directory name."""
    df.write.mode("overwrite").parquet(f"{path}/batch={batch_id}")


def incremental_near_dup_sink(
    corpus_path: str,
    bands_path: str,
    sets_path: str,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: Sequence[str] = (),
):
    """``foreachBatch`` sink closing the continual-ingest dedup loop AS A
    STREAM: each micro-batch is near-dup-checked against the AT-REST
    MinHash-LSH index (operators/dedup.py ``incremental_near_dup`` —
    O(batch × collision rate), never O(history)); survivors append to the
    corpus and their band/set rows append to the index, so the next batch
    sees them.

    This is the scale-correct home for UNBOUNDED dedup state: the
    watermark-bounded ``streaming_exact_dedup`` keeps state in executor
    memory and must forget beyond the horizon, while here the "state" is
    the parquet index itself — unbounded history at parquet cost, shared
    with the batch tier (same artifacts ``lsh_index`` builds offline).

    Exactly-once effect: every output lands under a ``batch=<id>``
    partition written with ``overwrite`` of just that partition, so a
    replayed micro-batch rewrites its own partition instead of appending
    twice (same discipline as streaming/sink.py, without a key-merge).

    ``carry_cols`` ride along into the corpus rows (url, crawl metadata)
    without touching the dedup keys or the index artifacts.
    """
    from network_iq_spark.operators.dedup import incremental_near_dup, lsh_index

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col, *carry_cols)
        bands = read_if_exists(spark, bands_path)
        sets = read_if_exists(spark, sets_path)
        if bands is not None and sets is not None:
            # History is STRICTLY earlier batches (the ann.py discipline):
            # on a replay the index already holds THIS batch's own rows,
            # and probing them would make every row self-match (jaccard 1
            # with itself), empty the survivor set, and leave the stale
            # partition standing — the replay must see the same snapshot
            # the original run saw.
            matches = incremental_near_dup(
                batch,
                bands.filter(F.col("batch") < batch_id).drop("batch"),
                sets.filter(F.col("batch") < batch_id).drop("batch"),
                threshold,
                text_col=text_col,
                id_col=id_col,
            )
            dup_ids = matches.select(
                F.col("new_doc").alias(id_col)
            ).distinct()
            survivors = batch.join(dup_ids, id_col, "left_anti")
        else:
            survivors = batch
        survivors = survivors.localCheckpoint()  # one evaluation, 3 writes
        new_bands, new_sets = lsh_index(survivors, text_col, id_col)
        write_batch_partition(survivors, corpus_path, batch_id)
        write_batch_partition(new_bands, bands_path, batch_id)
        write_batch_partition(new_sets, sets_path, batch_id)

    return sink


def incremental_media_dedup_sink(
    corpus_path: str,
    index_path: str,
    hash_col: str,
    max_hamming: int,
    n_bits: int,
    id_col: str = "media_id",
    carry_cols: Sequence[str] = (),
):
    """``foreachBatch`` sink closing the continual-ingest MEDIA dedup
    loop — the perceptual-hash sibling of :func:`incremental_near_dup_sink`:
    each micro-batch (already fingerprinted by a pure-map
    ``image_dhash`` / ``waveform_dhash`` / ``video_dhash`` select
    upstream — all three are stream-safe expressions) is checked against
    the AT-REST segment index (operators/dedup.py
    ``incremental_hamming_dedup`` — O(batch × collision rate), never
    O(history)); survivors append to the corpus and their segment rows
    (``hamming_index``) append to the index, so the next batch sees
    them. Same exactly-once discipline: every output lands under its
    ``batch=<id>`` partition via dynamic partition overwrite, so a
    replayed micro-batch converges instead of appending twice.

    One sink serves all modalities — the index schema is
    (id, hash, seg, seg_val) regardless of whether the fingerprint came
    from pixels, PCM, or frames; a deployment runs one sink per modality
    stream against per-modality paths.
    """
    from network_iq_spark.operators.dedup import (
        hamming_index,
        incremental_hamming_dedup,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, hash_col, *carry_cols)
        index = read_if_exists(spark, index_path)
        if index is not None:
            # Strictly earlier batches only — a replay otherwise probes
            # its own index rows, self-matches at hamming 0, and emits an
            # empty survivor set instead of recomputing the partition
            # (see incremental_near_dup_sink).
            matches = incremental_hamming_dedup(
                batch.select(id_col, hash_col),
                index.filter(F.col("batch") < batch_id).drop("batch"),
                hash_col,
                max_hamming,
                n_bits,
                id_col=id_col,
            )
            dup_ids = matches.select(F.col("new_id").alias(id_col)).distinct()
            survivors = batch.join(dup_ids, id_col, "left_anti")
        else:
            survivors = batch
        survivors = survivors.localCheckpoint()  # one evaluation, 2 writes
        new_index = hamming_index(
            survivors.select(id_col, hash_col), hash_col, max_hamming, n_bits,
            id_col=id_col,
        )
        write_batch_partition(survivors, corpus_path, batch_id)
        write_batch_partition(new_index, index_path, batch_id)

    return sink


def incremental_crop_dedup_sink(
    corpus_path: str,
    toks_path: str,
    grids_path: str,
    max_crop: int = 2,
    block: int | None = None,
    side: int = 8,
    ssd_tol: int = 0,
    id_col: str = "media_id",
    px_col: str = "px",
    w_col: str = "w",
    h_col: str = "h",
    carry_cols: Sequence[str] = (),
    frames: int = 1,
):
    """``foreachBatch`` sink closing the continual-ingest CROP-tolerant
    dedup loop (r11) — the crop tier's sibling of
    :func:`incremental_media_dedup_sink`: each micro-batch of (id, w, h,
    px) grids probes the AT-REST sub-block token index
    (operators/dedup.py ``incremental_cropped_dedup`` — pigeonhole
    recall 1.0 for ≤max_crop crops, O(batch × collision), never
    O(history)); a batch grid that is a crop of ANY at-rest grid (or
    vice versa — the 2-D lag scan is symmetric in sign) is dropped,
    survivors append to the corpus and their token + grid rows append to
    the index, so the next batch sees them. Same exactly-once
    discipline: every output lands under its ``batch=<id>`` partition
    via dynamic partition overwrite, and the probe reads STRICTLY
    earlier batches so a replayed micro-batch converges instead of
    self-matching at ssd 0 and emitting an empty survivor set.
    ``frames`` > 1 makes this the VIDEO crop cell's sink (r12):
    crop_index tokens are frame-0-bounded by construction, so the
    at-rest artifacts are format-identical — only the verify widens
    to sum SSD across every plane."""
    from network_iq_spark.operators.dedup import (
        crop_index,
        incremental_cropped_dedup,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, w_col, h_col, px_col, *carry_cols)
        toks = read_if_exists(spark, toks_path)
        grids = read_if_exists(spark, grids_path)
        if toks is not None and grids is not None:
            matches = incremental_cropped_dedup(
                batch.select(id_col, w_col, h_col, px_col),
                toks.filter(F.col("batch") < batch_id).drop("batch"),
                grids.filter(F.col("batch") < batch_id).drop("batch"),
                max_crop=max_crop,
                block=block,
                side=side,
                ssd_tol=ssd_tol,
                id_col=id_col,
                px_col=px_col,
                w_col=w_col,
                h_col=h_col,
                frames=frames,
            )
            dup_ids = matches.select(F.col("new_id").alias(id_col)).distinct()
            survivors = batch.join(dup_ids, id_col, "left_anti")
        else:
            survivors = batch
        survivors = survivors.localCheckpoint()  # one evaluation, 3 writes
        new_toks, new_grids = crop_index(
            survivors.select(id_col, w_col, h_col, px_col),
            max_crop=max_crop,
            block=block,
            side=side,
            id_col=id_col,
            px_col=px_col,
            w_col=w_col,
            h_col=h_col,
        )
        write_batch_partition(survivors, corpus_path, batch_id)
        write_batch_partition(new_toks, toks_path, batch_id)
        write_batch_partition(new_grids, grids_path, batch_id)

    return sink


def incremental_trim_dedup_sink(
    corpus_path: str,
    toks_path: str,
    seqs_path: str,
    max_trim: int = 2,
    anchor: int = 16,
    ssd_tol: int = 0,
    id_col: str = "media_id",
    s_col: str = "s",
    carry_cols: Sequence[str] = (),
    stride: int = 1,
):
    """``foreachBatch`` sink closing the continual-ingest TRIM-tolerant
    dedup loop (r13) — the audio-trim cell's sibling of
    :func:`incremental_crop_dedup_sink`, landing the same round as the
    tier itself: each micro-batch of (id, s) clips probes the AT-REST
    head-window token + sequence index (operators/dedup.py
    ``incremental_trimmed_dedup`` — pigeonhole recall 1.0 for trims ≤
    max_trim per side, O(batch × collision), never O(history)); a batch
    clip that is a trim of ANY at-rest clip or the untrimmed original
    of an at-rest trim is dropped (first-arrival-wins), survivors
    append to the corpus and their token + sequence rows append to the
    index, so the next batch sees them. Same exactly-once discipline:
    every output lands under its ``batch=<id>`` partition and the probe
    reads STRICTLY earlier batches so a replayed micro-batch converges
    instead of self-matching. ``stride`` > 1 makes this the VIDEO
    temporal-trim cell's sink (units = frames), the crop sink's
    ``frames`` / resample sink's ``stride`` precedent."""
    from network_iq_spark.operators.dedup import (
        incremental_trimmed_dedup,
        trim_index,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, s_col, *carry_cols)
        toks = read_if_exists(spark, toks_path)
        seqs = read_if_exists(spark, seqs_path)
        if toks is not None and seqs is not None:
            matches = incremental_trimmed_dedup(
                batch.select(id_col, s_col),
                toks.filter(F.col("batch") < batch_id).drop("batch"),
                seqs.filter(F.col("batch") < batch_id).drop("batch"),
                max_trim=max_trim,
                anchor=anchor,
                ssd_tol=ssd_tol,
                id_col=id_col,
                s_col=s_col,
                stride=stride,
            )
            dup_ids = matches.select(F.col("new_id").alias(id_col)).distinct()
            survivors = batch.join(dup_ids, id_col, "left_anti")
        else:
            survivors = batch
        survivors = survivors.localCheckpoint()  # one evaluation, 3 writes
        new_toks, new_seqs = trim_index(
            survivors.select(id_col, s_col),
            max_trim=max_trim,
            anchor=anchor,
            id_col=id_col,
            s_col=s_col,
            stride=stride,
        )
        write_batch_partition(survivors, corpus_path, batch_id)
        write_batch_partition(new_toks, toks_path, batch_id)
        write_batch_partition(new_seqs, seqs_path, batch_id)

    return sink


def incremental_resample_dedup_sink(
    corpus_path: str,
    index_path: str,
    factor: int = 2,
    stride: int = 1,
    id_col: str = "media_id",
    s_col: str = "s",
    carry_cols: Sequence[str] = (),
):
    """``foreachBatch`` sink closing the continual-ingest RESAMPLE-
    derivative dedup loop (r13, VERDICT item 7) — the scale-axis
    sibling of :func:`incremental_crop_dedup_sink`, completing sink
    coverage of the transform matrix: each micro-batch of (id, s) clips
    probes the AT-REST key index (operators/dedup.py
    ``incremental_resampled_dedup`` — two exact equi-joins, O(batch ×
    collision), never O(history)); a batch clip that is the ``factor``×
    decimation of an at-rest clip OR the full-rate original of an
    at-rest decimation is dropped (first-arrival-wins, the family's
    admission contract — a keep-best policy that prefers the full-rate
    side is the graph tier's job, not the sink's), survivors append to
    the corpus and their (own_key, derived_key) rows
    (``resample_index``) append to the index, so the next batch sees
    them. Same exactly-once discipline: every output lands under its
    ``batch=<id>`` partition, and the probe reads STRICTLY earlier
    batches so a replayed micro-batch recomputes its own partition
    instead of probing its own rows. ``stride`` > 1 makes this the
    VIDEO frame-rate cell's sink — the at-rest artifacts are
    format-identical (the crop sink's ``frames`` precedent)."""
    from network_iq_spark.operators.dedup import (
        incremental_resampled_dedup,
        resample_index,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, s_col, *carry_cols)
        index = read_if_exists(spark, index_path)
        if index is not None:
            matches = incremental_resampled_dedup(
                batch.select(id_col, s_col),
                index.filter(F.col("batch") < batch_id).drop("batch"),
                factor=factor,
                stride=stride,
                id_col=id_col,
                s_col=s_col,
            )
            dup_ids = matches.select(F.col("new_id").alias(id_col)).distinct()
            survivors = batch.join(dup_ids, id_col, "left_anti")
        else:
            survivors = batch
        survivors = survivors.localCheckpoint()  # one evaluation, 2 writes
        new_index = resample_index(
            survivors.select(id_col, s_col),
            factor=factor,
            stride=stride,
            id_col=id_col,
            s_col=s_col,
        )
        write_batch_partition(survivors, corpus_path, batch_id)
        write_batch_partition(new_index, index_path, batch_id)

    return sink


def chunk_admission_sink(
    corpus_path: str,
    bands_path: str,
    sets_path: str,
    max_dup_ppm: int = 200_000,
    threshold: float = 0.5,
    n_bands: int = 16,
    rows_per_band: int = 1,
    carry_cols: Sequence[str] = (),
):
    """``foreachBatch`` sink running the CHUNK-OVERLAP ADMISSION rule as
    a stream (the streaming form of the ``chunk_overlap_admission``
    sheet query): each micro-batch of documents is exploded into
    20-token chunks (``_fragments.chunk_docs`` — pure map, stream-safe),
    the chunks probe the AT-REST chunk LSH index, and a document is
    admitted while at most ``max_dup_ppm``/1e6 of its chunks near-match
    history — the RefinedWeb admission decision at ingest time, catching
    mostly-boilerplate pages that doc-grain near-dup dilutes below
    threshold. Admitted documents append to the corpus and their CHUNK
    index rows append to the index, so the next batch sees them.

    Same disciplines as the sibling sinks: the probe reads STRICTLY
    earlier batches (a replay otherwise self-matches its own at-rest
    chunks and rejects everything), every output lands via a direct
    partition-path write so a corrected replay genuinely rewrites — and
    the admission bit is integer arithmetic (1e6·dups ≤ ppm·n_chunks),
    so a replayed batch decides identically.
    """
    from network_iq_spark.operators.dedup import incremental_near_dup, lsh_index
    from network_iq_spark.queries._fragments import _CHUNK_ID_BASE, chunk_docs

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select("doc_id", "text", *carry_cols)
        chunks = chunk_docs(batch.select("doc_id", "text")).localCheckpoint()
        n_chunks = (
            chunks.select(
                F.expr(f"doc_id div {_CHUNK_ID_BASE}").alias("doc_id")
            )
            .groupBy("doc_id")
            .agg(F.count("*").alias("__n__"))
        )
        bands = read_if_exists(spark, bands_path)
        sets = read_if_exists(spark, sets_path)
        if bands is not None and sets is not None:
            matches = incremental_near_dup(
                chunks,
                bands.filter(F.col("batch") < batch_id).drop("batch"),
                sets.filter(F.col("batch") < batch_id).drop("batch"),
                threshold,
                n_bands=n_bands,
                rows_per_band=rows_per_band,
            )
            dup = (
                matches.select(
                    F.expr(f"new_doc div {_CHUNK_ID_BASE}").alias("doc_id"),
                    "new_doc",
                )
                .groupBy("doc_id")
                .agg(F.countDistinct("new_doc").alias("__d__"))
            )
            # Anchor the verdict on the BATCH's doc ids, not on n_chunks:
            # a doc whose text yields no [a-z0-9]+ tokens produces zero
            # chunks and would otherwise vanish from n_chunks and be
            # silently dropped by the left_semi (r10 ADVICE). With
            # __n__=0 and __d__=0 the integer rule reads 0 ≤ 0 —
            # trivially admitted, consistent with "0 of its chunks are
            # duplicates".
            verdicts = (
                batch.select("doc_id")
                .distinct()
                .join(n_chunks, "doc_id", "left")
                .join(dup, "doc_id", "left")
                .select(
                    "doc_id",
                    (
                        1_000_000 * F.coalesce(F.col("__d__"), F.lit(0))
                        <= max_dup_ppm * F.coalesce(F.col("__n__"), F.lit(0))
                    ).alias("__admit__"),
                )
            )
            admitted_ids = verdicts.filter(F.col("__admit__")).select("doc_id")
        else:  # first batch: empty history, everything admits
            admitted_ids = batch.select("doc_id").distinct()
        survivors = batch.join(admitted_ids, "doc_id", "left_semi").localCheckpoint()
        surv_chunks = chunk_docs(survivors.select("doc_id", "text"))
        new_bands, new_sets = lsh_index(
            surv_chunks, n_bands=n_bands, rows_per_band=rows_per_band
        )
        write_batch_partition(survivors, corpus_path, batch_id)
        write_batch_partition(new_bands, bands_path, batch_id)
        write_batch_partition(new_sets, sets_path, batch_id)

    return sink


def incremental_landmark_dedup_sink(
    corpus_path: str,
    index_path: str,
    min_votes: int = 2,
    corr2_min: float = 0.995,
    min_overlap: int = 8,
    id_col: str = "media_id",
    s_col: str = "s",
    carry_cols: Sequence[str] = (),
    max_bucket_size: int | None = 256,
):
    """``foreachBatch`` sink closing the continual-ingest LANDMARK
    dedup loop (r14) — the composed-transform sibling of
    :func:`incremental_trim_dedup_sink`, landing the same round as the
    tier itself so the landmark family ships with the full
    pairs/probe/sink symmetry every exact tier carries: each
    micro-batch of (id, s) clips probes the AT-REST landmark index
    (operators/dedup.py ``incremental_landmark_probe`` — the index row
    stores signal + fingerprints together, so the gain-robust verify
    needs no second corpus read; O(batch) extraction, O(batch ×
    collision) vote work, never O(history)); a batch clip that
    landmark-matches ANY at-rest clip (a trim∘gain∘noise or shift∘gain
    re-upload) is dropped (first-arrival-wins), survivors append to the
    corpus and their ``landmark_index`` rows append to the index, so
    the next batch sees them. Same exactly-once discipline: every
    output lands under its ``batch=<id>`` partition and the probe
    reads STRICTLY earlier batches, so a replayed micro-batch
    converges instead of self-matching. The family's measured-recall
    contract carries over verbatim: a missed near-dup is admitted (the
    S-curve tiers' documented failure direction), never a false
    drop — precision is the verify's, which the soak pins at 0 FP."""
    from network_iq_spark.operators.dedup import (
        incremental_landmark_probe,
        landmark_index,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, s_col, *carry_cols)
        index = read_if_exists(spark, index_path)
        if index is not None:
            matches = incremental_landmark_probe(
                batch.select(id_col, s_col),
                index.filter(F.col("batch") < batch_id).drop("batch"),
                min_votes=min_votes,
                corr2_min=corr2_min,
                min_overlap=min_overlap,
                id_col=id_col,
                s_col=s_col,
                max_bucket_size=max_bucket_size,
            )
            dup_ids = matches.select(F.col("new_id").alias(id_col)).distinct()
            survivors = batch.join(dup_ids, id_col, "left_anti")
        else:
            survivors = batch
        survivors = survivors.localCheckpoint()  # one evaluation, 2 writes
        new_index = landmark_index(
            survivors.select(id_col, s_col), id_col=id_col, s_col=s_col
        )
        write_batch_partition(survivors, corpus_path, batch_id)
        write_batch_partition(new_index, index_path, batch_id)

    return sink
