package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.connector.catalog.TableProvider
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `hdf5` DSv2 short name — an interchange STUB, registered so the HDF5
  * boundary fails as an interface with instructions instead of an
  * unknown-format error.
  *
  * The reference's only physical format is HDF5 (`read/hdf.py:504-540`);
  * this engine's is Parquet. No JVM HDF5 reader exists in this offline
  * build environment, so `spark.read.format("hdf5")` cannot be
  * implemented here — the supported path is the converter contract in
  * `docs/hdf5-interchange.md` (an h5py-side walk emitting the store's
  * Parquet tables, or [[graft.hep.HepWriter]] as the emitting side).
  * When a JVM HDF5 library is available, this provider is the seam to
  * implement: `inferSchema`/`getTable` over the heparchy group layout,
  * with partition pruning mapped to `evt-set` chunk groups.
  */
class Hdf5Interchange extends TableProvider with DataSourceRegister {

  override def shortName(): String = "hdf5"

  private def unavailable: Nothing = throw new UnsupportedOperationException(
    "HDF5 read support is not available in this build: no JVM HDF5 " +
      "library is present (offline environment). Convert the heparchy " +
      "file with tools/hdf5_to_parquet.py (the executable form of the " +
      "interchange contract in docs/hdf5-interchange.md; needs h5py + " +
      "pyarrow), then open the store with graft.hep.HepReader or the " +
      "'hep' catalog (graft.sources.HepCatalog).")

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    unavailable

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = unavailable
}
