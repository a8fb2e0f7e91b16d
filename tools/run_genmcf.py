"""spark-submit entry point for the genmcf job (the `dc-import genmcf`
equivalent, Processor.java:59-147).

Cluster:
    zip -r import_spark.zip import_spark
    SPARK_GRAFT_NO_MASTER=1 spark-submit --py-files import_spark.zip \
        tools/run_genmcf.py --tmcf schema.tmcf --csv /data/table.csv \
        --out /data/genmcf_out [--mcf /data/instances.mcf] \
        [--dict /data/dcid_dict.parquet] [--row-id-col id]

Outputs under --out: table_mcf_nodes/ (resolved MCF text),
failed_table_mcf_nodes/, report.json, summary_report.csv/json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tmcf", required=True, help="template MCF file")
    p.add_argument("--csv", help="CSV path (glob ok)")
    p.add_argument("--mcf", help="instance MCF path (node-blocked text)")
    p.add_argument("--dict", dest="dict_path", help="dcid dictionary parquet (prop, ext_id, dcid)")
    p.add_argument("--out", required=True)
    p.add_argument("--row-id-col", help="CSV column with a stable per-row id")
    p.add_argument("--summary-report", action="store_true")
    args = p.parse_args()

    from import_spark.operators.link import dcid_map_from_df
    from import_spark.operators.summary import svobs_from_triples, write_summary_report
    from import_spark.plans.genmcf import run_genmcf
    from import_spark.session import get_spark
    from import_spark.sources.mcf import read_mcf
    from import_spark.sources.tmcf import read_csv

    spark = get_spark("genmcf")
    with open(args.tmcf) as f:
        tmcf_text = f.read()
    csv_df = read_csv(spark, args.csv) if args.csv else None
    instance_nodes = read_mcf(spark, args.mcf) if args.mcf else None
    dcid_dict = None
    if args.dict_path:
        dcid_dict = dcid_map_from_df(spark.read.parquet(args.dict_path))

    res = run_genmcf(
        spark,
        tmcf_text,
        csv_df=csv_df,
        instance_nodes=instance_nodes,
        row_id_col=args.row_id_col,
        out_dir=args.out,
        dcid_dict=dcid_dict,
    )
    if args.summary_report:
        write_summary_report(svobs_from_triples(res.nodes), args.out)
    summary = {
        "rounds": res.rounds,
        "counters": res.report.get("levelSummary", {}),
    }
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
