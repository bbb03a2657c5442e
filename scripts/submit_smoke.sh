#!/bin/sh
# Smoke the north_rule's deployment path: package the engine as a zip and
# run an algorithm end-to-end under spark-submit --py-files (client mode,
# local master standing in for the cluster manager).
set -e
cd "$(dirname "$0")/.."
python -c "import shutil; shutil.make_archive('/tmp/tcr_kcore_spark', 'zip', '.', 'tcr_kcore_spark')"
exec spark-submit --master "local[${SPARK_GRAFT_CPUS:-4}]" \
    --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-4}" \
    --conf spark.ui.enabled=false \
    --py-files /tmp/tcr_kcore_spark.zip \
    scripts/submit_job.py --sf-dir "${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.001}" \
    --algo "${1:-pagerank}"
