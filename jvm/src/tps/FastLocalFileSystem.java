package tps;

import org.apache.hadoop.fs.LocalFileSystem;

/**
 * LocalFileSystem backed by {@link FastRawLocalFileSystem} - bind with
 * spark.hadoop.fs.file.impl=tps.FastLocalFileSystem (session.py does
 * this automatically when the jar is on the driver classpath).
 */
public class FastLocalFileSystem extends LocalFileSystem {
  public FastLocalFileSystem() {
    super(new FastRawLocalFileSystem());
  }
}
