package tps;

import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * RawLocalFileSystem whose setPermission is a no-op.
 *
 * Hadoop ships no native lib inside the pyspark wheel, so every
 * file/dir creation on the local filesystem falls back to forking
 * /bin/chmod (Shell.execCommand) to apply FsPermission.  Profiled on
 * this engine's CDC write path: a 512-file commit spends ~95% of its
 * executor runtime blocked in those forks (jstack: 32 task threads in
 * RawLocalFileSystem.setPermission -> Shell.run), turning an 0.7s
 * write into ~7s.  Permissions are meaningless for a single-user
 * local-mode engine; real deployments write to HDFS/S3 where this
 * class is never used.
 */
public class FastRawLocalFileSystem extends RawLocalFileSystem {
  @Override
  public void setPermission(Path p, FsPermission permission) {
    // no-op: skip the forked chmod; files keep process-umask perms
  }
}
