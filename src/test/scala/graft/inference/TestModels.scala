package graft.inference

/** Toy models ported from the reference test fixtures
  * (`ml_hadoop_experiment/pytorch/fixtures/test_models.py:28-89`): a
  * linear `Reducer` (sum over features of x - y), an identity
  * `Translator`, and a dict `Tokenizer`. They exist to lock the operator
  * plumbing — column binding order, batching, output types — with exact
  * golden values.
  */
object TestModels {

  /** `Reducer.forward`: sum(x - y, dim=1) with y broadcast over x.
    * `collection.Seq` because Spark Rows surface array columns as
    * `mutable.ArraySeq`.
    */
  final case class Reducer() extends Serializable {
    def apply(x: Seq[collection.Seq[Double]], y: Seq[collection.Seq[Double]]): Seq[Double] =
      x.zip(y).map { case (xs, ys) => xs.map(_ - ys.head).sum }
  }

  final case class Translator() extends Serializable {
    def apply(tokens: Seq[Seq[Int]]): Seq[Seq[Int]] = tokens
  }

  final case class Tokenizer() extends Serializable {
    private val vocabEn = Map("hello" -> 1, "world" -> 2, "how" -> 3, "are" -> 4, "you" -> 5)
    private val vocabFr = Map(1 -> "bonjour", 2 -> "tout le monde", 3 -> "comment", 4 -> "vas", 5 -> "tu")
    def encode(xs: Seq[String]): Seq[Seq[Int]] =
      xs.map(_.toLowerCase.split(" ").toSeq.map(w => vocabEn.getOrElse(w, 0)))
    def decode(xs: Seq[Seq[Int]]): Seq[String] =
      xs.map(_.map(t => vocabFr.getOrElse(t, "")).mkString(" "))
  }

  def loadReducer(): Reducer = Reducer()
  def loadTranslator(): Translator = Translator()
  def loadTokenizer(): Tokenizer = Tokenizer()
}
