#!/bin/bash
# Round-17 campaign at HEAD (sort orders, SQL WAP + snapshot procedures,
# nested ALTER, advice fixes): full sf0.1 map, organic sf1 map, and the
# 100x heavy subset (r16's 46 incl. ic94 + the round's ic95/ic96/ic97).
# Each leg writes its own map via SPARK_GRAFT_BENCH_OUT (an ad-hoc run
# can no longer stomp a round artifact) and keeps stderr as a tracked
# log — r16's ic94 campaign failure was undiagnosable because the leg's
# stderr was discarded.
set -x
cd /root/repo
mkdir -p target/bench_r17

SPARK_GRAFT_BENCH_OUT=bench_sf01_r17.json \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > target/bench_r17/sf01.stdout 2> target/bench_r17/sf01.stderr

SPARK_GRAFT_BENCH_OUT=bench_sf1_r17.json \
SPARK_GRAFT_SF_DIR=target/scratch/sf1 sbt -batch "runMain graft.Bench" \
  > target/bench_r17/sf1.stdout 2> target/bench_r17/sf1.stderr

HEAVY=an04_window_topn,an31_window_nav,an35_scd2,an39_column_stats,an48_pagerank,\
an63_equidepth_hist,an69_rolling_90d,dd03_minhash_lsh,dd06_cc_cluster,\
dd16_winnow_fingerprint,dd20_edit_distance,dd21_incremental_dedup,\
dd22_dup_span_coverage,dd23_served_band_index,dd24_band_index_maintenance,\
ic47_zorder_write,ic76_sql_iceberg_mor_delete,ic77_sql_iceberg_mor_update,\
ic78_sql_iceberg_mor_merge,ic79_sql_iceberg_eq_delete_read,ic80_sql_persistent_view,\
ic81_sql_iceberg_sparse_id_update,ic85_sql_eq_delete_maintenance,ic88_position_deletes_table,\
ic89_partition_evolution,ic90_type_promotion,ic91_sql_merge_not_matched_by_source,\
ic92_rename_drop_column,ic93_cherrypick_snapshot,ic94_native_meta_tables,\
ic95_sql_wap,ic96_nested_alter,ic97_native_sql_alter,\
mm03_decode,mm13_dhash,pp02_pack,pp07_neardup_curation,sm08_kmeans_iter,\
sm20_ivf_pq_search,sm25_ivf_index_build,sm32_ivfpq_index_search,st01_stream_hourly,\
st04_stream_join,st21_stream_mor_source,st22_stream_dedup_probe,tx08_tfidf,\
tx11_segment_dedup,tx26_lang_profile_overlap,tx29_bpe_apply
SPARK_GRAFT_BENCH_OUT=bench_sf10sim_r17.json \
SPARK_GRAFT_ONLY=$HEAVY SPARK_GRAFT_SF_DIR=target/scratch/sf10sim \
  sbt -batch "runMain graft.Bench" \
  > target/bench_r17/sf10sim.stdout 2> target/bench_r17/sf10sim.stderr

# record-integrity gate (r16 judge finding #2): a map that claims a
# different query count or hides a failure never gets described — the
# close-out asserts each artifact parses with failed==0 before the docs
# can reference it. A non-zero `failed` prints the leg's stderr tail so
# the cause ships with the record instead of evaporating.
python3 - <<'EOF'
import json, sys
bad = False
for f, leg in [("bench_sf01_r17.json", "sf01"),
               ("bench_sf1_r17.json", "sf1"),
               ("bench_sf10sim_r17.json", "sf10sim")]:
    try:
        m = json.load(open(f))
    except Exception as e:
        print(f"{f}: UNPARSEABLE: {e}"); bad = True; continue
    n = len(m.get("queries", {}))
    print(f"{f}: total={m.get('value')}s n_queries={n} failed={m.get('failed')}")
    if m.get("failed", 0) != 0:
        bad = True
        print(f"--- {leg} stderr tail (failure forensics) ---")
        print(open(f"target/bench_r17/{leg}.stderr").read()[-4000:])
sys.exit(1 if bad else 0)
EOF
echo CAMPAIGN_DONE
