// Tiny zstd decompressor for Spark rolling event logs (*.zstd) on
// boxes with no zstd CLI or python module: leans on the zstd-jni jar
// Spark already ships. Compiled on demand by parse_evlog_cpu.py:
//   javac -cp /opt/spark/jars/* -d <tmpdir> scripts/Zcat.java
//   java -cp <tmpdir>:/opt/spark/jars/* Zcat <file.zstd>
// Writes the decompressed bytes to stdout. Dev tooling only.
import com.github.luben.zstd.ZstdInputStream;
import java.io.FileInputStream;

public class Zcat {
    public static void main(String[] args) throws Exception {
        try (ZstdInputStream in =
                 new ZstdInputStream(new FileInputStream(args[0]))) {
            byte[] buf = new byte[1 << 20];
            int n;
            while ((n = in.read(buf)) > 0) System.out.write(buf, 0, n);
        }
        System.out.flush();
    }
}
