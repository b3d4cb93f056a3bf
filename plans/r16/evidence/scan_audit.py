import os, sys, json
sys.path.insert(0,'/root/repo')
from etl_caic_spark.registry import all_specs
from etl_caic_spark.session import get_spark
sf = '/root/testdata/sf0.01'
spark = get_spark(app_name='scan-audit', cpus=32)
spark.sparkContext.setLogLevel("ERROR")
out={}
for name, spec in sorted(all_specs().items()):
    try:
        df = spec.fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        out[name] = {
            "scans": plan.count("Scan parquet"),
            "exch": plan.count("Exchange") - plan.count("ReusedExchange"),
            "reused": plan.count("ReusedExchange"),
            "bep": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
        }
    except Exception as e:
        out[name] = {"err": str(e)[:80]}
json.dump(out, open('/tmp/scan_audit.json','w'), indent=0)
sus = sorted(((v.get("scans",0), n) for n,v in out.items() if "err" not in v), reverse=True)[:25]
for s,n in sus: print(s, n, out[n])
spark.stop()
