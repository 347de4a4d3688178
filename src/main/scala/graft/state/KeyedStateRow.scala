package graft.state

import graft.core.codec.KeyGroups

/** THE central relation (SURVEY.md §1.1; reference
  * types/KeyedStateRow.java:30-45): the minimal raw state row a RocksDB
  * backend needs to write the state back. Derived columns (key-group,
  * operator index) are pure functions of the key bytes
  * (KeyedStateRow.java:59-72).
  */
final case class KeyedStateRow(
    stateName: String,
    keyAndNamespaceBytes: Array[Byte],
    valueBytes: Array[Byte]) {

  def keyGroup(maxParallelism: Int): Int =
    KeyGroups.readKeyGroup(keyAndNamespaceBytes, maxParallelism)

  def operatorIndex(maxParallelism: Int, parallelism: Int): Int =
    KeyGroups.operatorIndexForKeyGroup(maxParallelism, parallelism,
      keyGroup(maxParallelism))
}
