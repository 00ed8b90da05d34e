package graft

import com.esotericsoftware.kryo.Kryo
import org.apache.spark.serializer.KryoRegistrator

/** Kryo class registration for the engine's RDD-shuffle payloads (guide
  * §2.3): with `spark.kryo.registrationRequired` off (the default), an
  * UNREGISTERED class ships its full class name once per serialization
  * stream — on the graph/CC fixpoint shuffles that is one name per task
  * output stream per superstep. Registration replaces the name with a
  * varint id. Value-neutral: registration changes only the wire framing
  * of shuffle bytes, never a computed result.
  *
  * The registered set is exactly what crosses `spark.serializer` in this
  * codebase: boxed primitives inside Tuple2 keys/values (the
  * pagerank/BFS/SSSP/CC supersteps shuffle (Long, Long) / (Long, Double)
  * pairs via reduceByKey), primitive arrays (adjacency payloads and
  * MLlib vector internals), and the MLlib dense/sparse vector classes
  * the k-means‖ init shuffles. Scala tuple classes themselves are
  * already registered by Spark's built-in AllScalaRegistrar; the boxed
  * field VALUES and arrays are not. */
class GraftKryoRegistrator extends KryoRegistrator {
  override def registerClasses(kryo: Kryo): Unit = {
    kryo.register(classOf[Array[Long]])
    kryo.register(classOf[Array[Double]])
    kryo.register(classOf[Array[Int]])
    kryo.register(classOf[Array[String]])
    kryo.register(classOf[java.lang.Long])
    kryo.register(classOf[java.lang.Double])
    kryo.register(classOf[java.lang.Integer])
    kryo.register(classOf[Array[scala.Tuple2[_, _]]])
    kryo.register(classOf[org.apache.spark.mllib.linalg.DenseVector])
    kryo.register(classOf[org.apache.spark.mllib.linalg.SparseVector])
    kryo.register(classOf[org.apache.spark.ml.linalg.DenseVector])
    kryo.register(classOf[org.apache.spark.ml.linalg.SparseVector])
  }
}
