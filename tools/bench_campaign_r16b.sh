#!/bin/bash
# Round-16 FINAL campaign (post-ic92): regenerate scale data, then the
# full sf0.1 map, the organic sf1 map, and the 100x heavy subset
# (r16's 43 + ic92). Maps land at the repo root, committed.
set -x
cd /root/repo
mkdir -p target/bench_r16b

python3 tools/gen_sf1.py target/scratch/sf1
python3 tools/make_sf10.py /root/testdata/sf0.1 target/scratch/sf1sim
python3 tools/make_sf100.py target/scratch/sf1sim target/scratch/sf10sim

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > target/bench_r16b/sf01.stdout 2>&1
cp bench_out.json bench_sf01_r16b.json

SPARK_GRAFT_SF_DIR=target/scratch/sf1 sbt -batch "runMain graft.Bench" \
  > target/bench_r16b/sf1.stdout 2>&1
cp bench_out.json bench_sf1_r16b.json

HEAVY=an04_window_topn,an31_window_nav,an35_scd2,an39_column_stats,an48_pagerank,\
an63_equidepth_hist,an69_rolling_90d,dd03_minhash_lsh,dd06_cc_cluster,\
dd16_winnow_fingerprint,dd20_edit_distance,dd21_incremental_dedup,\
dd22_dup_span_coverage,dd23_served_band_index,dd24_band_index_maintenance,\
ic47_zorder_write,ic76_sql_iceberg_mor_delete,ic77_sql_iceberg_mor_update,\
ic78_sql_iceberg_mor_merge,ic79_sql_iceberg_eq_delete_read,ic80_sql_persistent_view,\
ic81_sql_iceberg_sparse_id_update,ic85_sql_eq_delete_maintenance,ic88_position_deletes_table,\
ic89_partition_evolution,ic90_type_promotion,ic91_sql_merge_not_matched_by_source,\
ic92_rename_drop_column,\
mm03_decode,mm13_dhash,pp02_pack,pp07_neardup_curation,sm08_kmeans_iter,\
sm20_ivf_pq_search,sm25_ivf_index_build,sm32_ivfpq_index_search,st01_stream_hourly,\
st04_stream_join,st21_stream_mor_source,st22_stream_dedup_probe,tx08_tfidf,\
tx11_segment_dedup,tx26_lang_profile_overlap,tx29_bpe_apply
SPARK_GRAFT_ONLY=$HEAVY SPARK_GRAFT_SF_DIR=target/scratch/sf10sim \
  sbt -batch "runMain graft.Bench" > target/bench_r16b/sf10sim.stdout 2>&1
cp bench_out.json bench_sf10sim_r16b.json

echo CAMPAIGN_DONE
