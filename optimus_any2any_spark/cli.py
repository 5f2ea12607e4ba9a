"""``any2any``-compatible CLI front-end.

Reference: main.go:16-27 — ``any2any --from=<SOURCE> --to=<SINK>
[--to=<SINK2>] [--env=K=V ...] [--no-pipeline]``; config resolution
any2any.go:24-27 (process env merged with --env args, last wins).

Usage:
    python -m optimus_any2any_spark.cli --from=FILE --to=IO \
        --env=FILE__SOURCE_URI=file:///data/in.json \
        --env='JQ__QUERY=.[] | select(.age > 30)'
"""

from __future__ import annotations

import argparse
import sys

from optimus_any2any_spark.config import Config
from optimus_any2any_spark.pipeline import Pipeline
from optimus_any2any_spark.session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="any2any-spark",
        description="any source → any sink data pipeline on Spark",
    )
    p.add_argument("--from", dest="source", required=True, help="source component")
    p.add_argument(
        "--to", dest="sinks", action="append", required=True, help="sink component(s)"
    )
    p.add_argument(
        "--env", dest="env", action="append", default=[], help="K=V config override"
    )
    p.add_argument("--no-pipeline", action="store_true", help="direct transfer mode")
    p.add_argument("--dry-run", action="store_true", help="validate plan, no writes")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    cfg = Config.from_env(env_args=args.env)
    spark = get_spark(app_name="any2any")
    if cfg.get("LOG_LEVEL"):
        # LOG_LEVEL (reference config.go) -> Spark log level; the
        # reference's DEBUG/INFO/WARN/ERROR names map directly
        spark.sparkContext.setLogLevel(cfg.get("LOG_LEVEL").upper())
    try:
        pipeline = Pipeline(
            spark,
            source=args.source,
            sinks=args.sinks,
            config=cfg,
            no_pipeline=args.no_pipeline,
        )
        if args.dry_run or cfg.get_bool("DRY_RUN"):
            # dry-run ≙ the reference's EXPLAIN validation
            # (ext/maxcompute/source.go:249-271): build and validate the
            # plan, skip all side effects.
            pipeline.dataframe().explain("formatted")
            return 0
        if cfg.get_bool("ENABLE_METRICS"):
            # per-component record counts/durations via Observation
            # (reference: OTel meters, commonmetric.go:15-73)
            from optimus_any2any_spark.policy import ActionMetrics

            pipeline.metrics = ActionMetrics()
        result = pipeline.run()
        for sink, res in result.sink_results.items():
            print(f"{sink}: {res}", file=sys.stderr)
        if pipeline.metrics is not None:
            for rec in pipeline.metrics.records:
                print(f"metric: {rec}", file=sys.stderr)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
