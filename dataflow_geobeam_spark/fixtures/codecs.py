"""Compatibility shim — codecs moved to dataflow_geobeam_spark.codecs
(leaf module with minimal imports so Spark Python workers start fast)."""

from dataflow_geobeam_spark.codecs import *  # noqa: F401,F403
from dataflow_geobeam_spark.codecs import _FAKE_MAGIC, _decode_fake, _encode_fake  # noqa: F401
