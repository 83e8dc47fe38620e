package graft.tools

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Test fixture: a Hadoop FileSystem registered under a NON-`file` scheme
  * (`mockfs://lake/...`) that stores bytes on local disk — the cheapest
  * stand-in for an object store that still forces every pipeline read/write
  * through Hadoop's scheme resolution, URI qualification, and rename/commit
  * protocol exactly as an `s3a://` root would (no live MinIO in this
  * environment; reference wires one at `data_processing.py:12-28`).
  *
  * Path mapping is RawLocalFileSystem's own: scheme+authority are carried in
  * the FS URI, the path component is the local file. `mockfs://lake/tmp/x`
  * → local `/tmp/x`.
  */
class MockObjectStoreFS extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: URI = URI.create("mockfs://lake/")
}
