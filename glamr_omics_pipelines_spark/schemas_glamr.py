"""Declared schema contracts for the GLAMR warehouse star (SURVEY §1.3).

The reference pins these types in Postgres DDL at first load
(postgres.Rmd:259-266, 316-326, 396-403, 469-476, 536-547, 608-613, 713-719,
1210-1230, 1291-1297, 1647-1658); here they are the engine's equivalent
contracts, usable with SchemaRegistry.pin() or directly as read schemas.
Types follow SURVEY §1.2 (numeric→double — observed e-values to 1e-300 fit).
"""

from __future__ import annotations

from pyspark.sql.types import (BooleanType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType, TimestampType)


def _t(name, typ):
    return StructField(name, typ)


S = StringType()
I = IntegerType()
L = LongType()
D = DoubleType()

GLAMR_SCHEMAS: dict[str, StructType] = {
    # sample dimension (postgres.Rmd:53-104)
    "glamr_samples": StructType([
        _t("SampleID", S), _t("BioSampleID", S), _t("StudyID", S),
        _t("sample_type", S), _t("collection_date", TimestampType()),
        _t("collection_year", I), _t("lat", D), _t("lon", D),
        _t("nitrate", D), _t("ammonia", D), _t("ph", D), _t("tot_phos", D)]),
    # taxonomy dimension (postgres.Rmd:176-188)
    "tax_info": StructType([
        _t("tax_id", I), _t("tax_name", S), _t("rank", S),
        _t("full_lineage", S), _t("std_lineage", S),
        _t("kingdom", S), _t("phylum", S), _t("class", S), _t("order", S),
        _t("family", S), _t("genus", S), _t("species", S)]),
    # read QC ladder (postgres.Rmd:252-292)
    "read_count": StructType([
        _t("sample", S), _t("direction", S), _t("read_state", S),
        _t("state_order", I), _t("count", L),
        _t("percent_retained", D)]),
    # gene→UniRef alignments (postgres.Rmd:296-337)
    "diamond_uniref_contig_mapping": StructType([
        _t("sample", S), _t("qseqid", S), _t("qlen", I), _t("sseqid", S),
        _t("slen", I), _t("qstart", I), _t("qend", I), _t("sstart", I),
        _t("send", I), _t("evalue", D), _t("pident", D),
        _t("mismatch", I), _t("qcovhsp", D), _t("scovhsp", D)]),
    # per-sample read→UniRef abundance (postgres.Rmd:361-432)
    "read_mapping_to_uniref": StructType([
        _t("sample", S), _t("target", S), _t("num_seqs_aligned", L),
        _t("unique_coverage_of_target", D), _t("target_coverage", D),
        _t("average_seq_identity", D), _t("taxonomy", I)]),
    # kraken/bracken abundance (postgres.Rmd:690-833)
    "bracken": StructType([
        _t("sample", S), _t("database", S), _t("percent_abund", D),
        _t("count_w_subtax", L), _t("count_direct", L), _t("rank", S),
        _t("tax_id", I), _t("name", S)]),
    # bin quality (postgres.Rmd:904-916, 835-870)
    "checkm": StructType([
        _t("bin", S), _t("completeness", D), _t("contamination", D),
        _t("strain_heterogeneity", D)]),
    "gtdb": StructType([
        _t("bin", S), _t("classification", S), _t("red_value", D)]),
    "drep": StructType([
        _t("sample", S), _t("bin", S), _t("secondary_cluster", S),
        _t("drep_score", D), _t("is_cluster_rep", BooleanType())]),
    "contig_bin_membership": StructType([
        _t("contig", S), _t("binner", S), _t("bin", S)]),
    # gene abundance with prodigal metadata (postgres.Rmd:1169-1259)
    "gene_abundance": StructType([
        _t("sample", S), _t("gene", S), _t("contig", S), _t("left", L),
        _t("right", L), _t("strand", I), _t("gc_content", D),
        _t("Length", L), _t("Reads", L), _t("RPKM", D), _t("FPKM", D),
        _t("tpm", D)]),
    # KOfam annotations (postgres.Rmd:1263-1621)
    "kofam_scan": StructType([
        _t("gene", S), _t("ko", S), _t("sig", BooleanType()),
        _t("thrshld", D), _t("score", D), _t("e_value", D)]),
    # coverM coverage families (postgres.Rmd:1626-1786)
    "contig_abund": StructType([
        _t("sample", S), _t("contig", S), _t("mean", D), _t("trimmed_mean", D),
        _t("covered_bases", L), _t("variance", D), _t("length", L),
        _t("count", L), _t("reads_per_base", D), _t("rpkm", D), _t("tpm", D)]),
    # per-sample target TPM (code/postgres_scripts/tpm.R:17-35)
    "tpm2": StructType([
        _t("sample", S), _t("target", S), _t("num_seqs_aligned", L),
        _t("target_len", I), _t("tpm", D), _t("rpkm", D)]),
}
