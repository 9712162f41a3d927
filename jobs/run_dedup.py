"""spark-submit driver script for the webdedup pipeline.

Cluster usage (the north rule's ship shape)::

    zip -r webdedup.zip webdedup
    spark-submit --py-files webdedup.zip jobs/run_dedup.py \
        --input  s3://bucket/pages/ \
        --output s3://bucket/dedup_out \
        --hashes 128 --rows-per-band 4 --jaccard 0.8

``--py-files`` ships the pure-Python package to every executor;
spark-submit executes THIS file on the driver (it takes a script path,
not ``-m``), which delegates to :func:`webdedup.cli.main` — identical
behavior to ``python -m webdedup.cli`` locally. All kernels are pure
Python + numpy; no native builds to distribute.
"""
import sys

from webdedup.cli import main

if __name__ == "__main__":
    sys.exit(main())
