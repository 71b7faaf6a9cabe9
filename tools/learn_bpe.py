"""Regenerate operators/bpe.py's DEFAULT_MERGES: learn 64 merges from
the sf0.01 documents corpus with bpe_learn_merges and print the frozen
literal. Run manually when the merge table should be re-derived; the
vendored table is a build artifact, like a tokenizer's merges.txt.

Usage: python tools/learn_bpe.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from space_spark.operators.bpe import bpe_learn_merges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    merges = bpe_learn_merges(docs, "text", n_merges=64)
    print("DEFAULT_MERGES: List[Tuple[str, str]] = [")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()


