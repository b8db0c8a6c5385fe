"""Compatibility shim — moved to dataflow_geobeam_spark.audio_synth."""

from dataflow_geobeam_spark.audio_synth import *  # noqa: F401,F403
from dataflow_geobeam_spark.audio_synth import SEED, pcm_metrics, snr_db, synth_pcm  # noqa: F401
