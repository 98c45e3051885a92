package graft.core

import org.apache.spark.sql.DataFrame

/** The engine's replacement for the reference's Seurat god-object
  * (assembled at `3_Seurat.r:59-127`, merged `4_Prepare_experiment.r:46-51`):
  * a case class of DataFrame handles, each independently partitioned and
  * persistable as a Parquet directory.
  *
  *  - `expr`  — long-form sparse counts `(sample, barcode, gene, count)`;
  *    the COO embodiment of the reference's per-sample `dgCMatrix` list
  *    (`1_Preproc.r:70`). Absent rows are implicit zeros, so a
  *    multi-sample merge is a plain `union` and the format stays sparse
  *    at any scale.
  *  - `cells` — per-cell metadata keyed `(sample, barcode)` — the
  *    reference's `meta.data` (`help.r:31`, `3_Seurat.r:59-109`).
  *  - `genes` — annotation table `(input, name)` (+ `original_name`
  *    after dedup-rename) — `1_Preproc.r:143-146`.
  */
final case class Experiment(
    expr: DataFrame,
    cells: DataFrame,
    genes: DataFrame)
