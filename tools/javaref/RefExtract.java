import java.io.File;
import java.io.FileInputStream;
import java.util.Arrays;

import edu.pitt.dbmi.nlp.noble.coder.NobleCoder;
import edu.pitt.dbmi.nlp.noble.coder.processor.DocumentProcessor;
import edu.pitt.dbmi.nlp.noble.extract.model.Template;
import edu.pitt.dbmi.nlp.noble.extract.model.TemplateDocument;
import edu.pitt.dbmi.nlp.noble.extract.model.TemplateFactory;
import edu.pitt.dbmi.nlp.noble.ontology.owl.OOntology;
import edu.pitt.dbmi.nlp.noble.terminology.CompositTerminology;
import edu.pitt.dbmi.nlp.noble.terminology.impl.NobleCoderTerminology;
import edu.pitt.dbmi.nlp.noble.tools.ConText;
import edu.pitt.dbmi.nlp.noble.tools.TextTools;
import edu.pitt.dbmi.nlp.noble.util.CSVExporter;

/**
 * Headless InformationExtractor parity driver: import a .template XML
 * (items + embedded terminology), replay InformationExtractor.process
 * over every .txt in a directory, and write the CSVExporter result
 * matrix (RESULTS.tsv) for diffing against the Spark engine's
 * item_instances_tsv_df on identical inputs.
 *
 * Mirrors InformationExtractor.process(TemplateDocument) (:622-649) and
 * its per-file loop (:658-682), with ONE pinned deviation: the default
 * no-arg ConText() loads a hosted ontology that is not bundled with the
 * reference, so the coder's context detection is driven by the shared
 * fixture ConText OWL (same pin as the ConText mention-parity leg).
 *
 * Usage: java RefExtract template.template docs_dir out_dir [context.owl]
 */
public class RefExtract {
    public static void main(String[] args) throws Exception {
        NobleCoderTerminology.setPersistenceDirectory(
                new File("/tmp/noble_terms_ext"));
        TemplateFactory tf = TemplateFactory.getInstance();
        Template template = tf.importTemplate(new FileInputStream(args[0]));
        File outDir = new File(args[2]);
        outDir.mkdirs();
        CSVExporter csv = new CSVExporter(outDir);
        // InformationExtractor.getCoder (:601-615): composite terminology
        // over the selected templates' terminologies, default NobleCoder
        CompositTerminology terminology = new CompositTerminology();
        terminology.addTerminology(template.getTerminology());
        NobleCoder coder = new NobleCoder(terminology);
        if (args.length > 3) {
            coder.setConText(new ConText(
                    OOntology.loadOntology(new File(args[3]))));
            coder.setContextDetection(true);
        } else {
            coder.setContextDetection(false);
        }
        File[] files = new File(args[1]).listFiles();
        Arrays.sort(files);
        for (File f : files) {
            if (!f.getName().endsWith(".txt"))
                continue;
            String text = TextTools.getText(new FileInputStream(f));
            TemplateDocument doc = new TemplateDocument();
            doc.setTitle(f.getName());
            doc.setLocation(f.getAbsolutePath());
            doc.setText(text);
            doc.addTemplate(template);
            doc.setDocumentType(DocumentProcessor.suggestDocumentType(text));
            coder.process(doc);
            for (Template t : doc.getTemplates()) {
                if (t.isAppropriate(doc))
                    doc.addItemInstances(t, t.process(doc));
            }
            csv.export(doc);
            if (args.length > 4 && "html".equals(args[4])) {
                // per-doc Information Extraction report
                // (HTMLExporter.export(TemplateDocument) :518-586)
                // into <out>/reports/<name>.html
                edu.pitt.dbmi.nlp.noble.util.HTMLExporter hx =
                        new edu.pitt.dbmi.nlp.noble.util.HTMLExporter(
                                outDir);
                for (edu.pitt.dbmi.nlp.noble.coder.model.Mention m
                        : doc.getMentions())
                    if (m.getConcept().getTerminology() == null)
                        m.getConcept().setTerminology(
                                template.getTerminology());
                hx.export(doc);
                hx.flush();
            }
        }
        csv.flush();
        System.out.println("done");
    }
}
