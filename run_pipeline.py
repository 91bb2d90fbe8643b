#!/usr/bin/env python
"""spark-submit launcher for the transcript pipeline.

  zip -qr /tmp/clp.zip ci_log_processing_spark
  spark-submit --py-files /tmp/clp.zip run_pipeline.py \
      --input-dir /root/testdata/sf0.001 --output-dir /tmp/clp_out
"""
import sys

from ci_log_processing_spark.plans.job import main

if __name__ == "__main__":
    sys.exit(main())
