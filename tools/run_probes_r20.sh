#!/bin/bash
cd /root/repo
SPARK_GRAFT_PROBE_FACTOR=10 SPARK_GRAFT_ROUND=20 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ScaleProbe" > logs/r20/scaleprobe_10x.log 2>&1
echo "10x rc=$?" >> logs/r20/scaleprobe_10x.log
cp SCALEPROBE_r20.json SCALEPROBE_r20_10x_keep.json 2>/dev/null
SPARK_GRAFT_PROBE_FACTOR=30 SPARK_GRAFT_ROUND=20 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_PROBE_ONLY="graph_common_neighbors,multimodal_phash_pairs,dedup_embedding_cosine" sbt -batch "runMain graft.ScaleProbe" > logs/r20/scaleprobe_30x.log 2>&1
echo "30x rc=$?" >> logs/r20/scaleprobe_30x.log
cp SCALEPROBE_r20.json SCALEPROBE_30x_r20.json 2>/dev/null
SPARK_GRAFT_PROBE_FACTOR=100 SPARK_GRAFT_ROUND=20 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_PROBE_ONLY="graph_triangle_count,graph_common_neighbors,graph_pagerank,graph_kcore,graph_label_propagation,multimodal_phash_pairs,dedup_embedding_cosine,sim_ann_lsh,sim_ivf_probe,embed_kmeans" sbt -batch "runMain graft.ScaleProbe" > logs/r20/scaleprobe_100x.log 2>&1
echo "100x rc=$?" >> logs/r20/scaleprobe_100x.log
cp SCALEPROBE_r20.json SCALEPROBE_100x_r20.json 2>/dev/null
touch logs/r20/probes_done
