"""spark-submit-able example: compile examples/flagship.yaml and run it.

    python examples/run_flagship.py /tmp/flagship_out
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lumbermill_spark.pipeline import compile_pipeline
from lumbermill_spark.router import sink_stats
from lumbermill_spark.session import get_spark


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship_out"
    spark = get_spark("flagship-example")
    spec = open(__file__.rsplit("/", 1)[0] + "/flagship.yaml").read()
    pipe = compile_pipeline(spark, spec)
    results = pipe.run(base, run_id="example")
    for sink, info in results.items():
        print(sink, info)
    sink_stats(spark, base, "example").show(truncate=False)


if __name__ == "__main__":
    main()
