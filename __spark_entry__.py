"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship audio windowed-aggregate on sf0.001.
``queries()`` maps every implemented operator to a (spark, sf_dir) callable;
``oracle_sql()`` gives the DuckDB-equivalent SQL. Audio queries run over
this repo's deterministic fixtures (generated lazily by
``dataflow_geobeam_spark.fixtures.ensure_fixtures``); their oracles read the
generation-time golden parquet — an independent decode of the same payloads.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

FIXTURES_SF01 = "/root/repo/fixtures/sf0.01"
_GOLDEN = f"read_parquet('{FIXTURES_SF01}/golden_clips.parquet')"
_CLIPS = f"read_parquet('{FIXTURES_SF01}/clips.parquet')"
_TRANSCRIPTS = f"read_parquet('{FIXTURES_SF01}/transcripts_late.parquet')"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: valid clips -> vectorized decode ->
    10 s tumbling event-time windows per clip_id-prefix bucket."""
    from dataflow_geobeam_spark.plans import audio

    return audio.audio_window_tumbling(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dataflow_geobeam_spark.plans import audio, relational, training_data

    return {
        # --- audio graft pipeline (SURVEY.md §2.3/§2.4) ---
        "audio_window_tumbling": audio.audio_window_tumbling,
        "audio_stream_tumbling_sink": audio.audio_stream_tumbling_sink,
        "audio_window_sliding": audio.audio_window_sliding,
        "audio_window_session": audio.audio_window_session,
        "audio_decode_validity": audio.audio_decode_validity,
        "audio_clip_metrics": audio.audio_clip_metrics,
        "audio_transcript_join": audio.audio_transcript_join,
        "audio_codec_hourly": audio.audio_codec_hourly,
        "audio_bucket_agg_salted": audio.audio_bucket_agg_salted,
        "audio_frame_rms": audio.audio_frame_rms,
        "audio_vad": audio.audio_vad,
        "audio_vad_segments": audio.audio_vad_segments,
        "audio_extract_segments": audio.audio_extract_segments,
        "audio_augment_noise": audio.audio_augment_noise,
        "audio_speed_perturb": audio.audio_speed_perturb,
        "audio_cmvn": audio.audio_cmvn,
        "audio_specaugment": audio.audio_specaugment,
        "audio_normalize_loudness": audio.audio_normalize_loudness,
        "audio_augment_reverb": audio.audio_augment_reverb,
        "audio_corpus_split": audio.audio_corpus_split,
        "audio_align_tokens": audio.audio_align_tokens,
        "audio_spectral": audio.audio_spectral,
        "audio_near_dups": audio.audio_near_dups,
        "audio_fp_match": audio.audio_fp_match,
        "audio_fp_match_stream": audio.audio_fp_match_stream,
        "audio_resample_16k": audio.audio_resample_16k,
        "audio_flac_decode": audio.audio_flac_decode,
        "audio_sniff_decode": audio.audio_sniff_decode,
        "video_block_index": training_data.video_block_index,
        "audio_mel_features": audio.audio_mel_features,
        "audio_mfcc": audio.audio_mfcc,
        "audio_pitch": audio.audio_pitch,
        "pipeline_clean_asr_corpus": audio.pipeline_clean_asr_corpus,
        "pipeline_build_training_corpus": audio.pipeline_build_training_corpus,
        # --- relational operator coverage (SURVEY.md §2.4) ---
        "tpch_q1_pricing_summary": relational.q1_pricing_summary_rounded,
        "tpch_q6_forecast_revenue": relational.q6_rounded,
        "tpch_q3_top_orders": relational.q3_rounded,
        "tpch_q5_region_revenue": relational.q5_rounded,
        "events_tumbling": relational.events_tumbling,
        "events_sessions": relational.events_sessions,
        "events_approx_users": relational.events_approx_users,
        "events_pattern_contiguous": relational.events_pattern_contiguous,
        "events_pattern_absence": relational.events_pattern_absence,
        "events_pattern_kleene": relational.events_pattern_kleene,
        "events_pattern_bounded": relational.events_pattern_bounded,
        "events_match_recognize": relational.events_match_recognize,
        "events_funnel": relational.events_funnel,
        "top_customers": relational.top_customers_by_revenue,
        "order_percentiles": relational.order_price_percentiles,
        # --- training-data ops: text analysis ---
        "doc_token_stats": training_data.doc_token_stats,
        "doc_quality": training_data.doc_quality,
        "doc_langid": training_data.doc_langid,
        "doc_fingerprint": training_data.doc_fingerprint,
        "doc_text_metrics": training_data.doc_text_metrics,
        "pipeline_clean_corpus": training_data.pipeline_clean_corpus,
        "doc_mixture_sample": training_data.doc_mixture_sample,
        "doc_decontaminate": training_data.doc_decontaminate,
        "doc_pack_sequences": training_data.doc_pack_sequences,
        "doc_top_bigrams": training_data.doc_top_bigrams,
        # --- training-data ops: dedup family ---
        "dedup_exact_transcripts": training_data.dedup_exact_transcripts,
        "dedup_minhash_signature": training_data.dedup_minhash_signature,
        "dedup_minhash_pairs": training_data.dedup_minhash_pairs,
        "dedup_ngram_jaccard": training_data.dedup_ngram_jaccard,
        "dedup_edit_distance": training_data.dedup_edit_distance,
        "dedup_simhash_pairs": training_data.dedup_simhash_pairs,
        # --- training-data ops: similarity search ---
        "emb_topk_bruteforce": training_data.emb_topk_bruteforce,
        "emb_topk_lsh": training_data.emb_topk_lsh,
        "emb_topk_ivf": training_data.emb_topk_ivf,
        "emb_topk_ivfpq": training_data.emb_topk_ivfpq,
        "emb_topk_lsh_d256": training_data.emb_topk_lsh_d256,
        "emb_near_dups": training_data.emb_near_dups,
        "emb_near_dups_d256": training_data.emb_near_dups_d256,
        "emb_label_centroids": training_data.emb_label_centroids,
        # --- multimodal: real from-spec image decode kernel (round 4) ---
        "image_thumbnails": training_data.image_thumbnails,
        "image_near_dups": training_data.image_near_dups,
    }


def _simhash_oracle(max_hamming: int = 8, prefix_bits: int = 12) -> str:
    """DuckDB mirror of operators.dedup.simhash_pairs(portable=True):
    md5-hash60 token hashes -> per-bit signed votes -> 60-bit long assembly
    -> prefix-bucket self-join -> bit_count hamming."""
    votes = ",\n                   ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS v{b}" for b in range(60)
    )
    assemble = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(60)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
          FROM documents WHERE trim(text) <> ''
        ),
        h AS (
          SELECT doc_id,
                 CAST(('0x' || substring(md5(t || '#0'), 1, 15)) AS BIGINT) AS h
          FROM toks
        ),
        votes AS (
          SELECT doc_id,
                   {votes}
          FROM h GROUP BY doc_id
        ),
        sim AS (SELECT doc_id, ({assemble}) AS sim FROM votes),
        p AS (SELECT doc_id, sim, sim >> {60 - prefix_bits} AS prefix FROM sim)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
        FROM p a JOIN p b ON a.prefix = b.prefix AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
    """


def _text_metrics_oracle() -> str:
    """DuckDB mirror of plans.training_data.doc_text_metrics — stopword
    list, BPE-ish regex, and rolling-hash parameters imported from the
    engine module so the two can never drift."""
    from dataflow_geobeam_spark.functions.text import (
        BPE_ISH_PATTERN,
        ROLLING_B,
        ROLLING_M,
        STOPWORDS,
    )

    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
        WITH t AS (
          SELECT doc_id, text,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
          FROM documents
        )
        SELECT doc_id,
               round(CASE WHEN len(toks) > 0
                     THEN CAST(len(list_filter(toks, x -> list_contains([{stops}], lower(x)))) AS DOUBLE) / len(toks)
                     ELSE 0.0 END, 6) AS stopword_ratio,
               CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS bpe_tokens,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(toks, s -> CAST(('0x' || substring(md5(s || '#0'), 1, 15)) AS BIGINT))),
                 (acc, h) -> (acc * {ROLLING_B} + h) % {ROLLING_M}
               ) AS rolling_fp
        FROM t
    """


def oracle_sql() -> dict[str, str]:
    # the ANN goldens are deterministic (seeded hyperplanes / centroids);
    # materialize them for the gate's sf before handing DuckDB the paths
    from dataflow_geobeam_spark.fixtures.generate import (
        ensure_embeddings_hd,
        ensure_golden_ivf_topk,
        ensure_golden_lsh_topk,
        ensure_golden_near_dups,
    )

    from dataflow_geobeam_spark.fixtures.generate import ensure_golden_ivfpq_topk

    ensure_golden_lsh_topk("/root/testdata/sf0.01")
    ensure_golden_ivf_topk("/root/testdata/sf0.01")
    ensure_golden_ivfpq_topk("/root/testdata/sf0.01")
    emb_hd = ensure_embeddings_hd("/root/testdata/sf0.01")
    ensure_golden_lsh_topk(
        "/root/testdata/sf0.01", emb_path=emb_hd, out_name="golden_lsh_topk_d256.parquet"
    )
    # round-4 ADVICE fix: near-dup oracles read numpy goldens computed with
    # Spark's sequential fold accumulation instead of DuckDB's
    # list_cosine_similarity (different accumulation order could flip a
    # cosine at a 1e-6 rounding boundary and break the hash gate)
    ensure_golden_near_dups("/root/testdata/sf0.01", threshold=0.45)
    ensure_golden_near_dups(
        "/root/testdata/sf0.01",
        threshold=0.9,
        emb_path=emb_hd,
        out_name="golden_near_dups_d256.parquet",
    )
    # round-4: image fixture + thumbnail/near-dup goldens (independent
    # PPM/PGM/BMP codecs + pixel-embedding mirror)
    from dataflow_geobeam_spark.fixtures.generate import (
        ensure_golden_image_near_dups,
        ensure_golden_thumbnails,
    )

    ensure_golden_thumbnails("/root/testdata/sf0.01")
    ensure_golden_image_near_dups("/root/testdata/sf0.01")
    # round-5: planted audio near-dup corpus + all-pairs BER golden over
    # independent fingerprints of independently decoded payloads
    from dataflow_geobeam_spark.fixtures.generate import ensure_golden_audio_near_dups

    ensure_golden_audio_near_dups("/root/testdata/sf0.01")
    # round-5e: query-by-example fingerprint retrieval golden (exhaustive
    # independent inverted-index vote over the snippet fixture)
    from dataflow_geobeam_spark.fixtures.generate import ensure_golden_fp_match

    ensure_golden_fp_match("/root/testdata/sf0.01")
    # round-5e: deterministic noise-augmentation golden (independent
    # decode + scalar mix loop + independent RIFF encoder)
    from dataflow_geobeam_spark.fixtures.generate import (
        ensure_golden_augment,
        ensure_golden_speed,
    )
    from dataflow_geobeam_spark.operators.split import sample_sql, split_sql
    from dataflow_geobeam_spark.plans.training_data import MIX_RATES

    mix_where = " OR ".join(
        f"(source = '{s}' AND {sample_sql('doc_id', r)})"
        for s, r in sorted(MIX_RATES.items())
    )

    ensure_golden_augment("/root/testdata/sf0.01")
    ensure_golden_speed("/root/testdata/sf0.01")
    from dataflow_geobeam_spark.fixtures.generate import (
        ensure_golden_loudnorm,
        ensure_golden_specaugment,
    )

    ensure_golden_specaugment("/root/testdata/sf0.01")
    ensure_golden_loudnorm("/root/testdata/sf0.01")
    from dataflow_geobeam_spark.fixtures.generate import ensure_golden_reverb

    ensure_golden_reverb("/root/testdata/sf0.01")
    from dataflow_geobeam_spark.fixtures.generate import (
        ensure_golden_mel,
        ensure_golden_mfcc,
        ensure_golden_pitch,
        ensure_golden_flac_decode,
        ensure_golden_resample,
        ensure_golden_sniff_decode,
        ensure_golden_segments,
    )

    ensure_golden_resample("/root/testdata/sf0.01")
    ensure_golden_flac_decode("/root/testdata/sf0.01")
    ensure_golden_sniff_decode("/root/testdata/sf0.01")
    from dataflow_geobeam_spark.fixtures.generate import ensure_golden_video_blocks

    ensure_golden_video_blocks("/root/testdata/sf0.01")
    ensure_golden_mel("/root/testdata/sf0.01")
    ensure_golden_mfcc("/root/testdata/sf0.01")
    ensure_golden_pitch("/root/testdata/sf0.01")
    ensure_golden_segments("/root/testdata/sf0.01")
    return {
        "audio_window_tumbling": f"""
            SELECT CAST(floor(epoch(ts)/10)*10 AS BIGINT) AS window_start_s,
                   bucket,
                   CAST(count(*) AS BIGINT) AS n_clips,
                   CAST(sum(dur_ms) AS BIGINT) AS sum_dur_ms,
                   round(avg(rms), 6) AS mean_rms,
                   CAST(sum(n_samples) AS BIGINT) AS sum_samples
            FROM {_GOLDEN} WHERE valid
            GROUP BY 1, 2
        """,
        "audio_stream_tumbling_sink": f"""
            SELECT CAST(floor(epoch(ts)/10)*10 AS BIGINT) AS window_start_s,
                   bucket,
                   CAST(count(*) AS BIGINT) AS n_clips,
                   CAST(sum(dur_ms) AS BIGINT) AS sum_dur_ms,
                   round(avg(rms), 6) AS mean_rms,
                   CAST(sum(n_samples) AS BIGINT) AS sum_samples
            FROM {_GOLDEN} WHERE valid
            GROUP BY 1, 2
        """,
        "audio_window_sliding": f"""
            WITH v AS (SELECT bucket, ts, dur_ms, rms FROM {_GOLDEN} WHERE valid),
            w AS (
              SELECT CAST(floor(epoch(ts)/5)*5 AS BIGINT) AS window_start_s,
                     bucket, dur_ms, rms FROM v
              UNION ALL
              SELECT CAST(floor(epoch(ts)/5)*5 - 5 AS BIGINT) AS window_start_s,
                     bucket, dur_ms, rms FROM v
            )
            SELECT window_start_s, bucket,
                   CAST(count(*) AS BIGINT) AS n_clips,
                   CAST(sum(dur_ms) AS BIGINT) AS sum_dur_ms,
                   round(avg(rms), 6) AS mean_rms
            FROM w GROUP BY 1, 2
        """,
        "audio_window_session": f"""
            WITH v AS (SELECT bucket, ts, dur_ms FROM {_GOLDEN} WHERE valid),
            s AS (
              SELECT bucket, ts, dur_ms,
                     CASE WHEN lag(ts) OVER (PARTITION BY bucket ORDER BY ts) IS NULL
                               OR ts - lag(ts) OVER (PARTITION BY bucket ORDER BY ts)
                                  > INTERVAL 30 SECOND
                          THEN 1 ELSE 0 END AS new_s
              FROM v),
            g AS (SELECT bucket, ts, dur_ms,
                         sum(new_s) OVER (PARTITION BY bucket ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
                  FROM s)
            SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
                   bucket,
                   CAST(count(*) AS BIGINT) AS n_clips,
                   CAST(sum(dur_ms) AS BIGINT) AS sum_dur_ms
            FROM g GROUP BY bucket, sid
        """,
        "audio_decode_validity": f"""
            SELECT codec,
                   CAST(count(*) AS BIGINT) AS n_total,
                   CAST(sum(CASE WHEN decode_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_decode_ok,
                   CAST(sum(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
            FROM {_GOLDEN} GROUP BY codec
        """,
        "audio_clip_metrics": f"""
            SELECT clip_id, codec, n_samples,
                   round(rms, 6) AS rms, round(peak, 6) AS peak
            FROM {_GOLDEN} WHERE valid
        """,
        "audio_transcript_join": f"""
            WITH tr AS (
              SELECT DISTINCT t_clip_id, t_transcript, t_ts FROM {_TRANSCRIPTS}
            )
            SELECT c.clip_id,
                   CAST(floor(epoch(c.ts)) AS BIGINT) AS ts_s,
                   c.transcript,
                   tr.t_transcript,
                   (tr.t_clip_id IS NOT NULL) AS matched
            FROM (SELECT clip_id, transcript, ts FROM {_CLIPS}) c
            LEFT JOIN tr ON tr.t_clip_id = c.clip_id
                        AND tr.t_ts >= c.ts
                        AND tr.t_ts <= c.ts + INTERVAL 5 MINUTE
        """,
        "audio_codec_hourly": f"""
            SELECT CAST(floor(epoch(ts)/60)*60 AS BIGINT) AS window_start_s,
                   codec,
                   CAST(count(*) AS BIGINT) AS n_clips,
                   CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets,
                   round(sum(rms), 6) AS sum_rms
            FROM {_GOLDEN} WHERE valid GROUP BY 1, 2
        """,
        "audio_bucket_agg_salted": f"""
            SELECT bucket,
                   CAST(count(*) AS BIGINT) AS n_clips,
                   CAST(sum(dur_ms) AS BIGINT) AS sum_dur_ms,
                   round(sum(rms) / count(*), 6) AS mean_rms,
                   CAST(sum(n_samples) AS BIGINT) AS sum_samples
            FROM {_GOLDEN} WHERE valid GROUP BY bucket
        """,
        "tpch_q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q6_forecast_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1994-01-01'
              AND l_shipdate < TIMESTAMP '1995-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "tpch_q3_top_orders": """
            SELECT l_orderkey,
                   CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_s,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15'
              AND l_shipdate > TIMESTAMP '1995-03-15'
            GROUP BY l_orderkey, o_orderdate
        """,
        "tpch_q5_region_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
        """,
        "events_tumbling": """
            SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS window_start_s,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(avg(value), 6) AS avg_value,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "top_customers": """
            WITH rev AS (
              SELECT o_custkey, sum(o_totalprice) AS revenue
              FROM orders GROUP BY o_custkey
            )
            SELECT CAST(row_number() OVER (ORDER BY revenue DESC, c_custkey) AS INTEGER) AS rank,
                   c_custkey, c_name, round(revenue, 2) AS revenue
            FROM rev JOIN customer ON o_custkey = c_custkey
            QUALIFY rank <= 10
        """,
        # --- training-data ops ---------------------------------------------
        # top-k bigrams by document frequency: identical shingle formulation
        # (per-doc distinct), deterministic tie-break (count desc, gram asc)
        "doc_top_bigrams": f"""
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 2 THEN
                       list_distinct(list_transform(
                         generate_series(1, len(toks) - 1),
                         i -> array_to_string(list_slice(toks, i, i + 1), ' ')))
                     ELSE []::VARCHAR[] END AS grams
              FROM d
            )
            SELECT g AS gram, CAST(count(*) AS BIGINT) AS n_docs
            FROM (SELECT doc_id, unnest(grams) AS g FROM sh)
            GROUP BY g
            ORDER BY n_docs DESC, gram ASC
            LIMIT 20
        """,
        # true SQL mirror of the packing window: cumsum per source in
        # doc_id order, chunk = floor((cum - n)/512), exact integers
        "doc_pack_sequences": f"""
            WITH d AS (
              SELECT doc_id, source,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS n_tok
              FROM documents
            ), packed AS (
              SELECT source, n_tok,
                     sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum
              FROM d
            )
            SELECT source,
                   CAST(floor((cum - n_tok) / 512) AS BIGINT) AS chunk_id,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS n_tokens
            FROM packed
            GROUP BY 1, 2
        """,
        "doc_token_stats": f"""
            WITH d AS (
              SELECT lang, n_chars,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
              FROM documents
            )
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
                   round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars,
                   round(avg(CASE WHEN len(toks) = 0 THEN 0.0
                             ELSE len(list_distinct(toks))::DOUBLE / len(toks) END), 6)
                       AS avg_uniq_ratio
            FROM d GROUP BY lang
        """,
        "doc_quality": """
            WITH d AS (
              SELECT doc_id, text,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
              FROM documents
            ),
            f AS (
              SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     CASE WHEN len(toks) = 0 THEN 0.0
                          ELSE len(list_distinct(toks))::DOUBLE / len(toks) END AS uniq,
                     CASE WHEN length(text) = 0 THEN 0.0
                          ELSE length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE
                               / length(text) END AS alpha
              FROM d
            )
            SELECT doc_id, n_tokens,
                   round(uniq, 6) AS uniq_ratio,
                   round(alpha, 6) AS alpha_ratio,
                   round((CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1.0
                               WHEN n_tokens > 0 THEN 0.5 ELSE 0.0 END)
                         * uniq * alpha, 6) AS quality
            FROM f
        """,
        "doc_langid": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
              FROM documents
            ),
            v AS (
              SELECT doc_id, list_max([
                {'votes': CAST(len(list_filter(toks, x -> list_contains(['der','die','und','das','ein','nicht'], lower(x)))) AS BIGINT), 'lang': 'de'},
                {'votes': CAST(len(list_filter(toks, x -> list_contains(['the','and','of','a','to','is'], lower(x)))) AS BIGINT), 'lang': 'en'},
                {'votes': CAST(len(list_filter(toks, x -> list_contains(['el','la','de','que','los','una'], lower(x)))) AS BIGINT), 'lang': 'es'},
                {'votes': CAST(len(list_filter(toks, x -> list_contains(['le','la','et','les','des','une'], lower(x)))) AS BIGINT), 'lang': 'fr'},
                {'votes': CAST(len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','you3','wo3'], lower(x)))) AS BIGINT), 'lang': 'zh'}
              ]) AS best
              FROM d
            )
            SELECT doc_id, best.lang AS pred_lang, best.votes AS votes FROM v
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   CAST(('0x' || substring(md5(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) || '#0'
                   ), 1, 15)) AS BIGINT) AS fingerprint
            FROM documents
        """,
        "audio_frame_rms": f"""
            SELECT clip_id, frame_idx, frame_rms
            FROM read_parquet('{FIXTURES_SF01}/golden_frames.parquet')
        """,
        "audio_spectral": f"""
            SELECT clip_id, spectral_centroid_hz, spectral_bandwidth_hz,
                   spectral_rolloff_hz
            FROM read_parquet('{FIXTURES_SF01}/golden_spectral.parquet')
        """,
        "audio_vad": f"""
            WITH fl AS (
              SELECT clip_id, frame_idx,
                     frame_rms > greatest(
                       0.1 * max(frame_rms) OVER (PARTITION BY clip_id),
                       1e-4) AS speech
              FROM read_parquet('{FIXTURES_SF01}/golden_frames.parquet')
            ), fr AS (
              SELECT clip_id, speech,
                     speech AND NOT coalesce(
                       lag(speech) OVER (PARTITION BY clip_id
                                         ORDER BY frame_idx),
                       false) AS rising
              FROM fl
            )
            SELECT clip_id,
                   CAST(count(*) AS BIGINT) AS n_frames,
                   CAST(sum(CASE WHEN speech THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_speech,
                   round(sum(CASE WHEN speech THEN 1 ELSE 0 END)
                         / count(*), 6) AS speech_ratio,
                   CAST(sum(CASE WHEN rising THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_segments
            FROM fr GROUP BY clip_id
        """,
        "audio_vad_segments": f"""
            WITH fl AS (
              SELECT clip_id, frame_idx,
                     frame_rms > greatest(
                       0.1 * max(frame_rms) OVER (PARTITION BY clip_id),
                       1e-4) AS speech
              FROM read_parquet('{FIXTURES_SF01}/golden_frames.parquet')
            ), fr AS (
              SELECT clip_id, frame_idx, speech,
                     speech AND NOT coalesce(
                       lag(speech) OVER (PARTITION BY clip_id
                                         ORDER BY frame_idx),
                       false) AS rising
              FROM fl
            ), sg AS (
              SELECT clip_id, frame_idx, speech,
                     sum(CASE WHEN rising THEN 1 ELSE 0 END)
                       OVER (PARTITION BY clip_id ORDER BY frame_idx
                             ROWS UNBOUNDED PRECEDING) AS seg
              FROM fr
            )
            SELECT clip_id,
                   CAST(seg AS BIGINT) AS seg_idx,
                   CAST(count(*) AS BIGINT) AS n_frames,
                   CAST(min(frame_idx) * 50 AS BIGINT) AS start_ms,
                   CAST(max(frame_idx) * 50 + 100 AS BIGINT) AS end_ms
            FROM sg WHERE speech GROUP BY clip_id, seg
        """,
        "audio_extract_segments": f"""
            SELECT clip_id, seg_idx, start_ms, end_ms, n_bytes, seg_md5
            FROM read_parquet('{FIXTURES_SF01}/golden_segments.parquet')
        """,
        "audio_augment_noise": f"""
            SELECT clip_id, n_samples, aug_md5
            FROM read_parquet('{FIXTURES_SF01}/golden_augment.parquet')
        """,
        "audio_speed_perturb": f"""
            SELECT clip_id, speed, n_samples, aug_md5
            FROM read_parquet('{FIXTURES_SF01}/golden_speed.parquet')
        """,
        "audio_specaugment": f"""
            SELECT clip_id, f0, f_w, t0, t_w, n_frames,
                   {", ".join(f"m{m:02d}" for m in range(16))}
            FROM read_parquet('{FIXTURES_SF01}/golden_specaugment.parquet')
        """,
        "audio_normalize_loudness": f"""
            SELECT clip_id, n_samples, norm_md5
            FROM read_parquet('{FIXTURES_SF01}/golden_loudnorm.parquet')
        """,
        "audio_augment_reverb": f"""
            SELECT clip_id, n_samples, rev_md5
            FROM read_parquet('{FIXTURES_SF01}/golden_reverb.parquet')
        """,
        # true SQL mirror of the deterministic md5-prefix split expression
        # (operators/split.split_sql emits the same CASE both engines run)
        "audio_corpus_split": f"""
            SELECT {split_sql("clip_id")} AS split,
                   CAST(count(*) AS BIGINT) AS n_clips,
                   CAST(sum(dur_ms) AS BIGINT) AS sum_dur_ms
            FROM {_GOLDEN}
            GROUP BY 1
        """,
        # true SQL mirror of the two-pass CMVN plan (agg -> broadcast
        # normalize) over the independent golden MFCC table; DuckDB list
        # indexing is 1-based
        "audio_cmvn": f"""
            WITH f AS (
              SELECT clip_id, mfcc_mean
              FROM read_parquet('{FIXTURES_SF01}/golden_mfcc.parquet')
            ), s AS (
              SELECT {", ".join(
                  f"avg(mfcc_mean[{i + 1}]) AS mu{i}, "
                  f"stddev_pop(mfcc_mean[{i + 1}]) AS sd{i}"
                  for i in range(13)
              )}
              FROM f
            )
            SELECT clip_id, {", ".join(
                f"round(CASE WHEN sd{i} > 0 THEN (mfcc_mean[{i + 1}] - mu{i})"
                f" / sd{i} ELSE 0.0 END, 5) AS c{i:02d}"
                for i in range(13)
            )}
            FROM f, s
        """,
        "audio_align_tokens": f"""
            WITH segs AS (
              SELECT clip_id, seg_idx, start_ms,
                     end_ms - start_ms AS d,
                     coalesce(sum(end_ms - start_ms) OVER (
                       PARTITION BY clip_id ORDER BY seg_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS c_before,
                     sum(end_ms - start_ms) OVER (PARTITION BY clip_id) AS t
              FROM read_parquet('{FIXTURES_SF01}/golden_segments.parquet')
            ), toks AS (
              SELECT clip_id,
                     unnest(arr) AS token,
                     generate_subscripts(arr, 1) - 1 AS tok_idx,
                     len(arr) AS n
              FROM (
                SELECT clip_id,
                       regexp_split_to_array(trim(transcript), '\\s+') AS arr
                FROM {_GOLDEN} WHERE trim(transcript) <> ''
              )
            )
            SELECT toks.clip_id AS clip_id,
                   CAST(tok_idx AS INTEGER) AS tok_idx,
                   token,
                   seg_idx,
                   round(start_ms + CAST(tok_idx * t AS DOUBLE) / n - c_before, 6)
                     AS t_start_ms
            FROM toks JOIN segs ON toks.clip_id = segs.clip_id
            WHERE c_before <= CAST(tok_idx * t AS DOUBLE) / n
              AND CAST(tok_idx * t AS DOUBLE) / n < c_before + d
        """,
        "audio_near_dups": f"""
            SELECT id_a, id_b, ber
            FROM read_parquet('{FIXTURES_SF01}/golden_audio_near_dups.parquet')
        """,
        "audio_fp_match": f"""
            SELECT query_id, clip_id, offset_frames, votes
            FROM read_parquet('{FIXTURES_SF01}/golden_fp_match.parquet')
        """,
        "audio_fp_match_stream": f"""
            SELECT query_id, clip_id, offset_frames, votes
            FROM read_parquet('{FIXTURES_SF01}/golden_fp_match.parquet')
        """,
        "audio_resample_16k": f"""
            SELECT clip_id, n_samples, pcm16_md5
            FROM read_parquet('{FIXTURES_SF01}/golden_resample.parquet')
        """,
        "audio_flac_decode": f"""
            SELECT clip_id, sr_hz, n_samples, pcm16_md5
            FROM read_parquet('{FIXTURES_SF01}/golden_flac_decode.parquet')
        """,
        "audio_sniff_decode": f"""
            SELECT clip_id, container, sr_hz, n_samples, pcm16_md5
            FROM read_parquet('{FIXTURES_SF01}/golden_sniff_decode.parquet')
        """,
        "video_block_index": f"""
            SELECT video_id, track_number, codec_id, ts_ms, keyframe, block_bytes
            FROM read_parquet('{FIXTURES_SF01}/golden_video_blocks.parquet')
        """,
        "audio_mel_features": f"""
            SELECT clip_id,
                   {", ".join(f"mel_mean[{i + 1}] AS m{i:02d}" for i in range(16))}
            FROM read_parquet('{FIXTURES_SF01}/golden_mel.parquet')
        """,
        "audio_mfcc": f"""
            SELECT clip_id,
                   {", ".join(f"mfcc_mean[{i + 1}] AS c{i:02d}" for i in range(13))}
            FROM read_parquet('{FIXTURES_SF01}/golden_mfcc.parquet')
        """,
        "audio_pitch": f"""
            SELECT clip_id,
                   pitch_stats[1] AS f0_mean_hz,
                   pitch_stats[2] AS voiced_ratio
            FROM read_parquet('{FIXTURES_SF01}/golden_pitch.parquet')
        """,
        "pipeline_clean_asr_corpus": f"""
            WITH scored AS (
              SELECT clip_id, dur_ms, trim(transcript) AS t_norm,
                     round(length(trim(transcript))
                           / (dur_ms / 1000.0), 6) AS chars_per_s
              FROM {_GOLDEN}
              WHERE decode_ok
                AND dur_ms BETWEEN 300 AND 30000
                AND round(rms, 6) > 1e-4
                AND round(peak, 6) <= 0.999
                AND length(trim(transcript)) > 0
                AND round(length(trim(transcript))
                          / (dur_ms / 1000.0), 6) BETWEEN 0.5 AND 60.0
            ), survivors AS (
              SELECT t_norm, min(clip_id) AS clip_id,
                     CAST(count(*) AS BIGINT) AS n_copies
              FROM scored GROUP BY t_norm
            )
            SELECT s.clip_id, s.n_copies, k.dur_ms, k.chars_per_s
            FROM survivors s JOIN scored k USING (clip_id)
        """,
        # capstone: the clean stage's rules over the independent
        # golden_clips + the identical split CASE + golden_augment's
        # independent byte hashes — three gated stages crossed in one query
        "pipeline_build_training_corpus": f"""
            WITH scored AS (
              SELECT clip_id, dur_ms, trim(transcript) AS t_norm
              FROM {_GOLDEN}
              WHERE decode_ok
                AND dur_ms BETWEEN 300 AND 30000
                AND round(rms, 6) > 1e-4
                AND round(peak, 6) <= 0.999
                AND length(trim(transcript)) > 0
                AND round(length(trim(transcript))
                          / (dur_ms / 1000.0), 6) BETWEEN 0.5 AND 60.0
            ), survivors AS (
              SELECT t_norm, min(clip_id) AS clip_id,
                     CAST(count(*) AS BIGINT) AS n_copies
              FROM scored GROUP BY t_norm
            )
            SELECT s.clip_id, s.n_copies, a.n_samples, a.aug_md5
            FROM survivors s
            JOIN read_parquet('{FIXTURES_SF01}/golden_augment.parquet') a
              USING (clip_id)
            WHERE {split_sql("s.clip_id")} = 'train'
        """,
        "dedup_exact_transcripts": f"""
            SELECT t_clip_id AS clip_id, CAST(count(*) AS BIGINT) AS n_copies
            FROM {_TRANSCRIPTS}
            GROUP BY t_clip_id, t_transcript, t_ts
            HAVING count(*) > 1
        """,
        "dedup_minhash_signature": """
            WITH docs AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents WHERE trim(text) <> ''
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(generate_series(1, len(toks) - 2),
                         i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingles
              FROM docs WHERE len(toks) >= 3
            )
            SELECT doc_id,
                   list_min(list_transform(shingles, s -> CAST(('0x' || substring(md5(s || '#0'), 1, 15)) AS BIGINT))) AS mh0,
                   list_min(list_transform(shingles, s -> CAST(('0x' || substring(md5(s || '#1'), 1, 15)) AS BIGINT))) AS mh1,
                   list_min(list_transform(shingles, s -> CAST(('0x' || substring(md5(s || '#2'), 1, 15)) AS BIGINT))) AS mh2,
                   list_min(list_transform(shingles, s -> CAST(('0x' || substring(md5(s || '#3'), 1, 15)) AS BIGINT))) AS mh3
            FROM sh WHERE len(shingles) > 0
        """,
        "dedup_minhash_pairs": """
            WITH docs AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents WHERE trim(text) <> ''
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(generate_series(1, len(toks) - 2),
                         i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingles
              FROM docs WHERE len(toks) >= 3
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                         / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
                  / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
        """,
        "dedup_edit_distance": """
            WITH docs AS (
              SELECT doc_id, trim(text) AS t,
                     regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents WHERE trim(text) <> ''
            ),
            sh AS (
              SELECT doc_id, t,
                     list_distinct(list_transform(generate_series(1, len(toks) - 2),
                         i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingles
              FROM docs WHERE len(toks) >= 3
            ),
            ex AS (SELECT doc_id, t, unnest(shingles) AS s FROM sh),
            cand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.t AS ta, b.t AS tb
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              WHERE least(length(a.t), length(b.t))
                    >= 0.8 * greatest(length(a.t), length(b.t))
              GROUP BY 1, 2, 3, 4
              HAVING count(*) >= 3
            )
            SELECT id_a, id_b,
                   round(1.0 - levenshtein(ta, tb)::DOUBLE
                             / greatest(length(ta), length(tb)), 6) AS edit_sim
            FROM cand
            WHERE 1.0 - levenshtein(ta, tb)::DOUBLE
                      / greatest(length(ta), length(tb)) >= 0.8
        """,
        "dedup_ngram_jaccard": """
            WITH docs AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents WHERE trim(text) <> ''
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(generate_series(1, len(toks) - 2),
                         i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingles
              FROM docs WHERE len(toks) >= 3
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                         / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
                  / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
        """,
        "emb_topk_bruteforce": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 20
            ),
            c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
            s AS (
              SELECT query_id, neighbor_id,
                     round(list_cosine_similarity(qv, cv), 6) AS cosine
              FROM q JOIN c ON query_id <> neighbor_id
            )
            SELECT query_id, neighbor_id, cosine,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
            FROM s QUALIFY rank <= 5
        """,
        "events_sessions": """
            WITH s AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                  > INTERVAL 4 HOUR
                          THEN 1 ELSE 0 END AS new_s
              FROM events),
            g AS (SELECT user_id, ts, value,
                         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
                  FROM s)
            SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
                   user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM g GROUP BY user_id, sid
        """,
        "order_percentiles": """
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   round(quantile_cont(o_totalprice, 0.5), 6) AS p50_price,
                   round(quantile_cont(o_totalprice, 0.95), 6) AS p95_price,
                   round(quantile_cont(o_totalprice, 0.99), 6) AS p99_price
            FROM orders GROUP BY o_orderpriority
        """,
        "doc_mixture_sample": f"""
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            WHERE {mix_where}
            GROUP BY source
        """,
        # decontamination: identical shingles (the minhash-gated mirror) +
        # identical split CASE; train docs sharing any 5-gram with eval
        "doc_decontaminate": f"""
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
                     CASE WHEN {split_sql("doc_id")} = 'train'
                          THEN 'train' ELSE 'eval' END AS grp
              FROM documents
            ), sh AS (
              SELECT doc_id, grp,
                     CASE WHEN len(toks) >= 5 THEN
                       list_distinct(list_transform(
                         generate_series(1, len(toks) - 4),
                         i -> array_to_string(list_slice(toks, i, i + 4), ' ')))
                     ELSE []::VARCHAR[] END AS grams
              FROM d
            ), ex AS (
              SELECT doc_id, grp, unnest(grams) AS g FROM sh
            )
            SELECT t.doc_id,
                   CAST(count(DISTINCT t.g) AS BIGINT) AS n_overlap
            FROM ex t
            JOIN (SELECT DISTINCT g FROM ex WHERE grp = 'eval') e ON t.g = e.g
            WHERE t.grp = 'train'
            GROUP BY t.doc_id
        """,
        "pipeline_clean_corpus": """
            WITH d AS (
              SELECT doc_id, text,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
              FROM documents
            ),
            scored AS (
              SELECT doc_id,
                     (list_max([
                       {'votes': CAST(len(list_filter(toks, x -> list_contains(['der','die','und','das','ein','nicht'], lower(x)))) AS BIGINT), 'lang': 'de'},
                       {'votes': CAST(len(list_filter(toks, x -> list_contains(['the','and','of','a','to','is'], lower(x)))) AS BIGINT), 'lang': 'en'},
                       {'votes': CAST(len(list_filter(toks, x -> list_contains(['el','la','de','que','los','una'], lower(x)))) AS BIGINT), 'lang': 'es'},
                       {'votes': CAST(len(list_filter(toks, x -> list_contains(['le','la','et','les','des','une'], lower(x)))) AS BIGINT), 'lang': 'fr'},
                       {'votes': CAST(len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','you3','wo3'], lower(x)))) AS BIGINT), 'lang': 'zh'}
                     ])).lang AS pred_lang,
                     round((CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0
                                 WHEN len(toks) > 0 THEN 0.5 ELSE 0.0 END)
                           * (CASE WHEN len(toks) = 0 THEN 0.0
                                   ELSE len(list_distinct(toks))::DOUBLE / len(toks) END)
                           * (CASE WHEN length(text) = 0 THEN 0.0
                                   ELSE length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE / length(text) END),
                           6) AS quality,
                     CAST(('0x' || substring(md5(
                         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) || '#0'
                     ), 1, 15)) AS BIGINT) AS fingerprint
              FROM d
            ),
            filt AS (SELECT * FROM scored WHERE quality >= 0.2 AND pred_lang = 'en'),
            surv AS (
              SELECT fingerprint, min(doc_id) AS doc_id,
                     CAST(count(*) AS BIGINT) AS n_copies
              FROM filt GROUP BY fingerprint
            )
            SELECT s.doc_id, s.fingerprint, s.n_copies, f.quality
            FROM surv s JOIN filt f ON s.doc_id = f.doc_id
        """,
        "doc_text_metrics": _text_metrics_oracle(),
        "dedup_simhash_pairs": _simhash_oracle(),
        "emb_topk_lsh": f"""
            SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
            FROM read_parquet('{FIXTURES_SF01}/golden_lsh_topk.parquet')
        """,
        "emb_topk_ivf": f"""
            SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
            FROM read_parquet('{FIXTURES_SF01}/golden_ivf_topk.parquet')
        """,
        "emb_topk_ivfpq": f"""
            SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
            FROM read_parquet('{FIXTURES_SF01}/golden_ivfpq_topk_v2.parquet')
        """,
        "emb_topk_lsh_d256": f"""
            SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
            FROM read_parquet('{FIXTURES_SF01}/golden_lsh_topk_d256.parquet')
        """,
        "emb_near_dups_d256": f"""
            SELECT id_a, id_b, cosine
            FROM read_parquet('{FIXTURES_SF01}/golden_near_dups_d256.parquet')
        """,
        "events_approx_users": """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
                   TRUE AS approx_within_tol
            FROM events GROUP BY event_type
        """,
        "events_pattern_contiguous": """
            WITH o AS (
              SELECT user_id, event_id, ts, event_type,
                     lead(event_type, 1) OVER w AS ty1, lead(ts, 1) OVER w AS ts1,
                     lead(event_type, 2) OVER w AS ty2, lead(ts, 2) OVER w AS ts2
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, event_id AS anchor_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS t0_s,
                   CAST(floor(epoch(ts1)) AS BIGINT) AS t1_s,
                   CAST(floor(epoch(ts2)) AS BIGINT) AS t2_s,
                   CAST(floor(epoch(ts2)) AS BIGINT)
                     - CAST(floor(epoch(ts)) AS BIGINT) AS span_s
            FROM o
            WHERE event_type = 'view' AND ty1 = 'click' AND ty2 = 'purchase'
              AND ts2 <= ts + INTERVAL 604800 SECOND
        """,
        "events_pattern_absence": """
            SELECT e1.user_id, e1.event_id AS anchor_id,
                   CAST(floor(epoch(e1.ts)) AS BIGINT) AS t0_s
            FROM events e1
            WHERE e1.event_type = 'view' AND NOT EXISTS (
              SELECT 1 FROM events e2
              WHERE e2.user_id = e1.user_id AND e2.event_type = 'purchase'
                AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 3600 SECOND
            )
        """,
        "events_pattern_kleene": """
            WITH r AS (
              SELECT user_id, event_id, ts, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events
            ), o AS (
              SELECT user_id, event_id, ts, event_type, rn,
                     max(CASE WHEN event_type <> 'click' THEN rn END)
                       OVER wp AS nc_rn,
                     last_value(CASE WHEN event_type <> 'click'
                                     THEN event_type END IGNORE NULLS)
                       OVER wp AS nc_ty,
                     last_value(CASE WHEN event_type <> 'click'
                                     THEN ts END IGNORE NULLS)
                       OVER wp AS nc_ts,
                     last_value(CASE WHEN event_type <> 'click'
                                     THEN event_id END IGNORE NULLS)
                       OVER wp AS nc_id
              FROM r
              WINDOW wp AS (PARTITION BY user_id ORDER BY rn
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            )
            SELECT user_id, nc_id AS anchor_id,
                   CAST(rn - 1 - nc_rn AS BIGINT) AS n_b,
                   CAST(floor(epoch(nc_ts)) AS BIGINT) AS t0_s,
                   CAST(floor(epoch(ts)) AS BIGINT) AS t_end_s,
                   CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(nc_ts)) AS BIGINT) AS span_s
            FROM o
            WHERE event_type = 'purchase' AND nc_ty = 'view'
              AND rn - 1 - nc_rn >= 1
              AND ts <= nc_ts + INTERVAL 604800 SECOND
        """,
        "events_pattern_bounded": """
            WITH o AS (
              SELECT user_id, event_id, ts, event_type,
                     lead(event_type, 1) OVER w AS ty1, lead(ts, 1) OVER w AS ts1,
                     lead(event_type, 2) OVER w AS ty2, lead(ts, 2) OVER w AS ts2,
                     lead(event_type, 3) OVER w AS ty3, lead(ts, 3) OVER w AS ts3
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), m AS (
              SELECT user_id, event_id AS anchor_id, 2 AS n_b, ts, ts3 AS te
              FROM o
              WHERE event_type = 'view'
                AND ty1 IN ('click', 'error') AND ty2 IN ('click', 'error')
                AND ty3 = 'purchase' AND ts3 <= ts + INTERVAL 604800 SECOND
              UNION ALL
              SELECT user_id, event_id, 1, ts, ts2
              FROM o
              WHERE event_type = 'view' AND ty1 IN ('click', 'error')
                AND ty2 = 'purchase' AND ts2 <= ts + INTERVAL 604800 SECOND
            ), g AS (
              SELECT *, row_number() OVER (PARTITION BY user_id, anchor_id
                                           ORDER BY n_b DESC) AS rk
              FROM m
            )
            SELECT user_id, anchor_id, CAST(n_b AS BIGINT) AS n_b,
                   CAST(floor(epoch(ts)) AS BIGINT) AS t0_s,
                   CAST(floor(epoch(te)) AS BIGINT) AS t_end_s,
                   CAST(floor(epoch(te)) AS BIGINT)
                     - CAST(floor(epoch(ts)) AS BIGINT) AS span_s
            FROM g WHERE rk = 1
        """,
        "events_match_recognize": """
            WITH r AS (
              SELECT user_id, event_id, ts, event_type, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events
            )
            SELECT c.user_id, a.event_id AS anchor_id,
                   CAST(c.rn - a.rn - 1 AS BIGINT) AS n_b,
                   CAST(floor(epoch(a.ts)) AS BIGINT) AS t0_s,
                   CAST(floor(epoch(c.ts)) AS BIGINT) AS t_end_s,
                   CAST(floor(epoch(c.ts)) AS BIGINT)
                     - CAST(floor(epoch(a.ts)) AS BIGINT) AS span_s
            FROM r c JOIN r a
              ON a.user_id = c.user_id AND a.rn < c.rn - 1
            WHERE c.event_type = 'purchase' AND c.value >= 30.0
              AND a.event_type = 'view'
              AND NOT EXISTS (SELECT 1 FROM r m
                              WHERE m.user_id = c.user_id
                                AND m.rn > a.rn AND m.rn < c.rn
                                AND m.event_type <> 'click')
              AND c.ts <= a.ts + INTERVAL 604800 SECOND
        """,
        "events_funnel": """
            WITH anchors AS (
              SELECT user_id, event_id AS anchor_id, ts AS ts0
              FROM events WHERE event_type = 'signup'
            ),
            s1 AS (
              SELECT a.*, (SELECT min(e.ts) FROM events e
                           WHERE e.user_id = a.user_id AND e.event_type = 'view'
                             AND e.ts > a.ts0) AS ts1
              FROM anchors a
            ),
            s2 AS (
              SELECT s1.*, (SELECT min(e.ts) FROM events e
                            WHERE e.user_id = s1.user_id AND e.event_type = 'purchase'
                              AND e.ts > s1.ts1) AS ts2
              FROM s1 WHERE ts1 IS NOT NULL
            )
            SELECT user_id, anchor_id,
                   CAST(floor(epoch(ts0)) AS BIGINT) AS t0_s,
                   CAST(floor(epoch(ts1)) AS BIGINT) AS t1_s,
                   CAST(floor(epoch(ts2)) AS BIGINT) AS t2_s,
                   CAST(floor(epoch(ts2)) AS BIGINT)
                     - CAST(floor(epoch(ts0)) AS BIGINT) AS span_s
            FROM s2
            WHERE ts2 IS NOT NULL AND ts2 <= ts0 + INTERVAL 86400 SECOND
        """,
        "emb_near_dups": f"""
            SELECT id_a, id_b, cosine
            FROM read_parquet('{FIXTURES_SF01}/golden_near_dups.parquet')
        """,
        "image_thumbnails": f"""
            SELECT img_id, container, thumb_md5, thumb_len
            FROM read_parquet('{FIXTURES_SF01}/golden_thumbnails_v5.parquet')
        """,
        "image_near_dups": f"""
            SELECT id_a, id_b, cosine
            FROM read_parquet('{FIXTURES_SF01}/golden_image_near_dups_v5.parquet')
        """,
        "emb_label_centroids": """
            WITH e AS (SELECT label, unnest(embedding) AS v FROM embeddings)
            SELECT label,
                   CAST(count(*) AS BIGINT) AS n_values,
                   round(sqrt(sum(CAST(v AS DOUBLE) * v)), 6) AS frobenius,
                   round(avg(CAST(v AS DOUBLE)), 9) AS mean_component
            FROM e GROUP BY label
        """,
    }
