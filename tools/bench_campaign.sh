#!/bin/bash
set -x
cd /root/repo
mkdir -p target/bench_r7
python3 tools/make_sf10.py /root/testdata/sf0.1 target/scratch/sf1sim
python3 tools/make_sf100.py target/scratch/sf1sim target/scratch/sf10sim
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > target/bench_r7/sf01.stdout 2> target/bench_r7/sf01.stderr
cp bench_out.json target/bench_r7/bench_sf01.json
SPARK_GRAFT_SF_DIR=target/scratch/sf1sim sbt -batch "runMain graft.Bench" > target/bench_r7/sf1sim.stdout 2> target/bench_r7/sf1sim.stderr
cp bench_out.json target/bench_r7/bench_sf1sim.json
HEAVY=st04_stream_join,ic47_zorder_write,an39_column_stats,an48_pagerank,tx26_lang_profile_overlap,an04_window_topn,an31_window_nav,an69_rolling_90d,dd06_cc_cluster,dd03_minhash_lsh,sm08_kmeans_iter,sm20_ivf_pq_search,tx08_tfidf,tx11_segment_dedup,an63_equidepth_hist,pp02_pack,mm03_decode,st01_stream_hourly,an35_scd2,dd16_winnow_fingerprint,dd22_dup_span_coverage,tx29_bpe_apply,sm25_ivf_index_build
SPARK_GRAFT_ONLY=$HEAVY SPARK_GRAFT_SF_DIR=target/scratch/sf10sim sbt -batch "runMain graft.Bench" > target/bench_r7/sf10sim.stdout 2> target/bench_r7/sf10sim.stderr
cp bench_out.json target/bench_r7/bench_sf10sim.json
echo CAMPAIGN_DONE
