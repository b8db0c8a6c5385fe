"""Dump .explain('formatted') for the round-6 optimization targets.

Usage: python tools/dump_r06_plans.py before|after [query ...]
Writes plans/r06/<query>_<tag>.txt. Uses sf0.1 (the bench corpus) so the
plan shapes match what bench.py times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TARGETS = [
    "pipeline_clean_asr_corpus",
    "pipeline_build_training_corpus",
    "dedup_minhash_pairs",
    "emb_near_dups",
    "emb_near_dups_d256",
    "audio_fp_match",
    "audio_cmvn",
    "audio_mfcc",
    "audio_mel_features",
    "audio_specaugment",
    "audio_pitch",
    "doc_decontaminate",
    "audio_resample_16k",
    "audio_augment_noise",
    "audio_speed_perturb",
    "audio_normalize_loudness",
    "audio_augment_reverb",
    "audio_extract_segments",
    "audio_flac_decode",
    "audio_sniff_decode",
    "dedup_edit_distance",
    "audio_vad",
    "audio_vad_segments",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    names = only or TARGETS

    import __spark_entry__ as entrymod
    from dataflow_geobeam_spark.session import get_spark

    spark = get_spark("plans-r06")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"skip unknown {name}")
            continue
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
