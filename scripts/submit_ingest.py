"""Thin spark-submit driver script: the package itself ships via
``--py-files kcjfs.zip`` (see ``kafka_connect_jdbc_flatten_spark/cli.py``
docstring for the full command line)."""

import sys

from kafka_connect_jdbc_flatten_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
