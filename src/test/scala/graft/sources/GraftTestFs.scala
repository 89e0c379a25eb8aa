package graft.sources

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A second SCHEME over the local disk (`graftfs://`) for cross-filesystem
  * tests: Hadoop throws "Wrong FS" whenever a Path of one scheme hits a
  * FileSystem handle of another, so driving file:// tables against
  * graftfs:// destinations proves the per-side FileSystem resolution the
  * cross-store verbs (export, replicate) promise — with zero external
  * services. Register with `fs.graftfs.impl = graft.sources.GraftTestFs`.
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
