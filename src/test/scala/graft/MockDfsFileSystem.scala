package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A local-disk-backed Hadoop FileSystem registered under the
  * NON-`file:` scheme `mockdfs:` — the standard Hadoop-test stand-in
  * for an HDFS-style checkpoint filesystem (Spark's own checkpoint
  * suites use the same RawLocalFileSystem-with-overridden-URI trick).
  * Registering `fs.mockdfs.impl = graft.MockDfsFileSystem` makes every
  * `mockdfs:/...` path resolve through the full Hadoop FileSystem API
  * while the bytes land on local disk, so specs can drive the
  * graftsink arrival log (VERDICT r11 item 1: the log must route
  * through the CHECKPOINT's FileSystem, not java.io) end-to-end
  * against a non-local scheme without a cluster. */
class MockDfsFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockdfs:///")
  override def getScheme: String = "mockdfs"
}
